"""PerformerLM / scBERT torch state_dict -> flax variables converter.

Maps the reference's module names (llm/performer_pytorch.py, llm/scbert.py)
onto gridnext_tpu.models.performer naming:

  token_emb.weight                              -> token_emb/embedding
  performer.net.layers.{i}.0.norm.*             -> performer/wrap_{i}_attn_norm
  performer.net.layers.{i}.0.fn.to_{q,k,v,out}  -> performer/layers_{i}_attn/*
  performer.net.layers.{i}.0.fn.fast_attention.projection_matrix
                                                -> 'favor' collection
  performer.net.layers.{i}.1.norm.*             -> performer/wrap_{i}_ff_norm
  performer.net.layers.{i}.1.fn.fn.w{1,2}.*     -> performer/layers_{i}_ff/*
  norm.*                                        -> norm
  to_out.*                                      -> to_out (Linear head) or
                                                   AttentionClassifier fields
  pos_emb.emb.weight                            -> returned separately as the
                                                   gene2vec weight array

Also converts the scBERT AttentionClassifier head (conv1 == Dense(dim -> 1)).
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def performer_lm_from_torch(sd: Mapping, depth: int,
                             use_scalenorm: bool = False,
                             ) -> Tuple[dict, Optional[np.ndarray]]:
    """Convert a PerformerLM state_dict.

    Returns (variables, g2v_weights): variables has 'params' and 'favor'
    collections shaped for :class:`gridnext_tpu.models.performer.PerformerLM`;
    g2v_weights is the gene2vec positional table if present (pass it to the
    model's ``g2v_weights`` field), else None.
    """
    p = {}
    fav = {}

    p["token_emb"] = {"embedding": _np(sd["token_emb.weight"])}

    perf = {}
    perf_fav = {}
    for i in range(depth):
        base = f"performer.net.layers.{i}"
        if f"{base}.0.norm.weight" in sd:
            perf[f"wrap_{i}_attn_norm"] = _layernorm(sd, f"{base}.0.norm")
        attn = {
            "to_q": _linear(sd, f"{base}.0.fn.to_q"),
            "to_k": _linear(sd, f"{base}.0.fn.to_k"),
            "to_v": _linear(sd, f"{base}.0.fn.to_v"),
            "to_out": _linear(sd, f"{base}.0.fn.to_out"),
        }
        perf[f"layers_{i}_attn"] = attn
        proj_key = f"{base}.0.fn.fast_attention.projection_matrix"
        if proj_key in sd:
            perf_fav[f"layers_{i}_attn"] = {
                "fast_attention": {"projection": _np(sd[proj_key])}}

        if f"{base}.0.g" in sd:
            # AMBIGUOUS torch key: PreScaleNorm and ReZero both expose
            # '.0.g' (performer_pytorch.py:288-306) -- the wrapper type is
            # model config the state dict cannot reveal, so ScaleNorm
            # checkpoints must be converted with use_scalenorm=True
            if use_scalenorm:
                perf[f"wrap_{i}_attn_norm"] = {
                    "g": _np(sd[f"{base}.0.g"]).reshape(1)}
                perf[f"wrap_{i}_ff_norm"] = {
                    "g": _np(sd[f"{base}.1.g"]).reshape(1)}
            else:  # ReZero gains (use_rezero models)
                perf[f"wrap_{i}_attn_rezero_g"] = \
                    _np(sd[f"{base}.0.g"]).reshape(1)
                perf[f"wrap_{i}_ff_rezero_g"] = \
                    _np(sd[f"{base}.1.g"]).reshape(1)
        if f"{base}.1.norm.weight" in sd:
            perf[f"wrap_{i}_ff_norm"] = _layernorm(sd, f"{base}.1.norm")
        # Chunk wraps FeedForward: .1.fn.fn.w1 / .w2
        ff_base = f"{base}.1.fn.fn" if f"{base}.1.fn.fn.w1.weight" in sd \
            else f"{base}.1.fn"
        perf[f"layers_{i}_ff"] = {
            "w1": _linear(sd, f"{ff_base}.w1"),
            "w2": _linear(sd, f"{ff_base}.w2"),
        }

    p["performer"] = perf
    if perf_fav:
        fav["performer"] = perf_fav

    p["norm"] = _layernorm(sd, "norm")

    if "to_out.weight" in sd:  # plain Linear LM head
        p["to_out"] = _linear(sd, "to_out")
    elif "to_out.fc1.weight" in sd:  # scBERT AttentionClassifier
        conv_w = _np(sd["to_out.conv1.weight"])  # (1, 1, 1, dim)
        p["to_out"] = {
            "conv1": {"kernel": conv_w.reshape(conv_w.shape[-1], 1),
                      "bias": _np(sd["to_out.conv1.bias"])},
            "fc1": _linear(sd, "to_out.fc1"),
            "fc2": _linear(sd, "to_out.fc2"),
            "fc3": _linear(sd, "to_out.fc3"),
        }

    g2v = None
    if "pos_emb.emb.weight" in sd:
        w = _np(sd["pos_emb.emb.weight"])
        g2v = w[:-1]  # the model re-appends the trailing zero row itself

    variables = {"params": p}
    if fav:
        variables["favor"] = fav
    return variables, g2v


def scbert_from_torch(sd: Mapping, depth: int = 6,
                      use_scalenorm: bool = False):
    """Convert a full scBERT checkpoint for gridnext_tpu.models.scbert.scBERT.

    Returns (variables, g2v_weights) with params nested under the
    'performer_lm' scope used by the scBERT wrapper module.
    """
    inner, g2v = performer_lm_from_torch(
        sd, depth, use_scalenorm=use_scalenorm)
    lm_params = dict(inner["params"])
    root = {"performer_lm": lm_params}
    # The AttentionClassifier head binds at the scBERT root scope (it is
    # constructed in scBERT.setup), so hoist it out of the lm params.
    if "to_out" in lm_params and "conv1" in lm_params["to_out"]:
        root["to_out"] = lm_params.pop("to_out")
    variables = {"params": root}
    if "favor" in inner:
        variables["favor"] = {"performer_lm": inner["favor"]}
    return variables, g2v
