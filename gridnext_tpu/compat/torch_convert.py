"""PyTorch state_dict -> flax variables converters.

Lets users of the reference load their trained checkpoints (e.g. the shipped
``densenet_ba44_p*.pth``, notebooks/register_ba44_image.ipynb cell 3) into
this framework's models. Input is a plain ``{name: tensor-like}`` mapping --
pass ``torch.load(path, map_location='cpu')`` output or any dict of arrays;
torch itself is only needed to unpickle the file, not here.

Layout conventions converted:
  torch Conv2d weight (out, in, kh, kw)  -> flax (kh, kw, in, out)
  torch Linear weight (out, in)          -> flax (in, out)
  torch BatchNorm {weight,bias,running_mean,running_var}
      -> flax {scale,bias} params + {mean,var} batch_stats
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_w(t):
    return _np(t).transpose(2, 3, 1, 0)


def _linear_w(t):
    return _np(t).transpose(1, 0)


def _bn(sd: Mapping, prefix: str):
    params = {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]), "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def densenet_from_torch(sd: Mapping, block_config=(6, 12, 24, 16),
                        small_inputs: bool = False, classify: bool = True):
    """Convert a reference DenseNet state_dict to flax variables.

    Reference module names (densenet.py:100-138): ``features.conv0``,
    ``features.norm0``, ``features.denseblock{i}.denselayer{j}.{norm1,conv1,
    norm2,conv2}``, ``features.transition{i}.{norm,conv}``,
    ``features.norm_final``, ``classifier``.

    Our flax DenseNet creates modules in call order, so names are positional:
    ``conv0``, then ``BatchNorm_0`` (stem, if not small_inputs), then per
    dense layer a ``_DenseLayer_{k}`` containing BatchNorm_0/Conv_0/
    BatchNorm_1/Conv_1, per transition a ``_Transition_{k}``, the final
    ``BatchNorm_{n}``, and ``classifier``.
    """
    params: dict = {}
    stats: dict = {}

    params["conv0"] = {"kernel": _conv_w(sd["features.conv0.weight"])}

    n_stem_bn = 0
    if not small_inputs:
        p, s = _bn(sd, "features.norm0")
        params["BatchNorm_0"] = p
        stats["BatchNorm_0"] = s
        n_stem_bn = 1

    layer_idx = 0
    trans_idx = 0
    for bi, n_layers in enumerate(block_config, start=1):
        for li in range(1, n_layers + 1):
            pre = f"features.denseblock{bi}.denselayer{li}"
            name = f"_DenseLayer_{layer_idx}"
            p0, s0 = _bn(sd, pre + ".norm1")
            p1, s1 = _bn(sd, pre + ".norm2")
            params[name] = {
                "BatchNorm_0": p0,
                "Conv_0": {"kernel": _conv_w(sd[pre + ".conv1.weight"])},
                "BatchNorm_1": p1,
                "Conv_1": {"kernel": _conv_w(sd[pre + ".conv2.weight"])},
            }
            stats[name] = {"BatchNorm_0": s0, "BatchNorm_1": s1}
            layer_idx += 1
        if bi != len(block_config):
            pre = f"features.transition{bi}"
            name = f"_Transition_{trans_idx}"
            p, s = _bn(sd, pre + ".norm")
            params[name] = {
                "BatchNorm_0": p,
                "Conv_0": {"kernel": _conv_w(sd[pre + ".conv.weight"])},
            }
            stats[name] = {"BatchNorm_0": s}
            trans_idx += 1

    p, s = _bn(sd, "features.norm_final")
    params[f"BatchNorm_{n_stem_bn}"] = p
    stats[f"BatchNorm_{n_stem_bn}"] = s

    if classify and "classifier.weight" in sd:
        params["classifier"] = {
            "kernel": _linear_w(sd["classifier.weight"]),
            "bias": _np(sd["classifier.bias"]),
        }

    return {"params": params, "batch_stats": stats}


def count_mlp_from_torch(sd: Mapping):
    """Convert the tutorial count-MLP ``nn.Sequential`` state_dict.

    Sequential indices (Tutorial_visium_count.ipynb cell 12): Linear 0, 1,
    BatchNorm1d 2, Linear 4, 5, BatchNorm1d 6, Linear 8.
    """
    def dense(i):
        return {"kernel": _linear_w(sd[f"{i}.weight"]), "bias": _np(sd[f"{i}.bias"])}

    p2, s2 = _bn(sd, "2")
    p6, s6 = _bn(sd, "6")
    params = {
        "Dense_0": dense(0), "Dense_1": dense(1), "BatchNorm_0": p2,
        "Dense_2": dense(4), "Dense_3": dense(5), "BatchNorm_1": p6,
        "Dense_4": dense(8),
    }
    stats = {"BatchNorm_0": s2, "BatchNorm_1": s6}
    return {"params": params, "batch_stats": stats}
