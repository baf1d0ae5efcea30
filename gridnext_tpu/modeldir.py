"""Trained-model-directory loading: model.json metadata -> live models.

A trained model directory (written by the train-* CLI commands) is the
deployment unit below the artifact level: ``model.json`` (architecture +
classes + preprocessing fields) beside ``g_state.msgpack`` (the weights).
This module is the ONE place that metadata is interpreted -- the CLI's
register/evaluate/export/serve commands and the resident server
(server.py) all build their models here, so the contract can never drift
between them.

Errors raise ``ValueError`` / ``FileNotFoundError``; the CLI maps them to
``sys.exit`` at its boundary, the server to HTTP 400s.
"""

from __future__ import annotations

import json
import os

__all__ = ["load_model_dir", "image_registrar_from_meta",
           "image_f_from_meta", "mm_model_from_meta", "grid_model_from_meta",
           "scbert_count_transform", "submodule_variables"]


def submodule_variables(variables, key: str):
    """Extract one submodule's variables dict from a composed model's tree.

    ``variables`` is a full variables dict ({'params': ..., optional
    'batch_stats', extra collections like scBERT's FAVOR 'favor'});
    ``key`` is the submodule's param-collection name (e.g.
    'patch_classifier', 'count_classifier'). Every collection that carries
    the submodule travels -- the one extraction rule shared by
    ``image_f_from_meta`` and the count-distill path, so neither can
    silently drop a collection the other keeps.
    """
    out = {"params": variables["params"][key]}
    for col, sub in variables.items():
        if col == "params" or sub is None:
            continue
        if key in sub:
            out[col] = sub[key]
    return out


def image_f_from_meta(meta, classes, variables):
    """(f_module, f_variables) for a trained IMAGE model dir.

    Extracts the spot classifier (its module reconstructed from model.json,
    its variables pulled out of the GridNet* tree) -- the teacher side of
    the ``distill`` flow and any other f-only consumer. ``f_variables`` has
    'params' and, for BatchNorm models, 'batch_stats'.
    """
    model_name = meta.get("model", "")
    if model_name.endswith("TpuPatchClassifier"):
        from gridnext_tpu.models import TpuPatchClassifier
        from gridnext_tpu.models.tpu_f import tpu_f_arch_kwargs

        f = TpuPatchClassifier(n_classes=len(classes),
                               **tpu_f_arch_kwargs(meta.get("tpu_f")))
    elif model_name.endswith("DenseNet121"):
        from gridnext_tpu.models import densenet121

        f = densenet121(num_classes=len(classes))
    else:
        raise ValueError(
            f"not an image model dir (model={model_name!r}); the f "
            "extractor needs a GridNet[Hex]+DenseNet121 or "
            "+TpuPatchClassifier directory")
    return f, submodule_variables(variables, "patch_classifier")


def load_model_dir(model_dir):
    """(meta, classes, variables) from a trained model directory."""
    from gridnext_tpu.train import load_checkpoint

    with open(os.path.join(model_dir, "model.json")) as fh:
        meta = json.load(fh)
    payload = load_checkpoint(os.path.join(model_dir, "g_state.msgpack"))
    variables = {"params": payload["params"]}
    if payload.get("batch_stats") is not None:
        variables["batch_stats"] = payload["batch_stats"]
    # extra collections (e.g. a scBERT count-f's FAVOR+ 'favor' projections)
    variables.update(payload.get("extra_vars") or {})
    return meta, meta["classes"], variables


def image_registrar_from_meta(meta, classes, variables, mesh=None):
    """Jitted SlideRegistrar for a trained IMAGE model dir's metadata --
    the shared construction of `register`, `export`, and `serve` (f
    architecture, window size, and hex vs square-HD lattice all come from
    model.json)."""
    from gridnext_tpu.models import GridNetHex, densenet121
    from gridnext_tpu.serving import SlideRegistrar

    model_name = meta.get("model", "")
    if model_name.endswith("TpuPatchClassifier"):
        from gridnext_tpu.models import TpuPatchClassifier
        from gridnext_tpu.models.tpu_f import tpu_f_arch_kwargs

        f = TpuPatchClassifier(n_classes=len(classes),
                               **tpu_f_arch_kwargs(meta.get("tpu_f")))
    else:
        f = densenet121(num_classes=len(classes))

    grid_dims = meta.get("grid_dims")
    if grid_dims is not None:
        # square HD image model: same jitted slide->labels serving path,
        # with direct (array_row, array_col) grid indexing and the
        # Cartesian GridNet corrector (from_gridnet auto-detects it)
        from gridnext_tpu.models import GridNet

        g = GridNet(patch_classifier=f, n_classes=len(classes),
                    patch_chunk=meta.get("patch_chunk", 624))
        return SlideRegistrar.from_gridnet(
            g, variables, patch_size=meta.get("patch_px", 128),
            window_size=meta.get("window_px"), mesh=mesh,
            patch_chunk=meta.get("patch_chunk", 624),
            normalize=None, h_st=int(grid_dims[0]), w_st=int(grid_dims[1]))
    g = GridNetHex(patch_classifier=f, n_classes=len(classes))
    return SlideRegistrar.from_gridnet(
        g, variables, patch_size=meta.get("patch_px", 128),
        window_size=meta.get("window_px"), mesh=mesh,
        patch_chunk=meta.get("patch_chunk", 624), normalize=None)


def mm_model_from_meta(meta, classes):
    """GridNetMM-family model from a trained model dir's metadata (count-f
    scBERT vs CountMLP, image-f TPU-shaped vs DenseNet-121, hex vs
    Cartesian corrector, training-time chunk sizes)."""
    from gridnext_tpu.models import (CountMLP, GridNetHexMM, GridNetMM,
                                     TpuPatchClassifier, densenet121)

    if meta.get("count_f") == "scbert":
        from gridnext_tpu.models import scBERT

        f_count = scBERT(n_genes=meta["scbert_vocab"],
                         dim=meta["scbert_dim"],
                         depth=meta["scbert_depth"],
                         heads=meta["scbert_heads"],
                         dim_head=meta.get("scbert_dim_head", 64),
                         nb_features=meta.get("scbert_features"),
                         n_classes=len(classes),
                         generalized_attention=True)
    else:
        # count_mlp_bn=False marks a distilled (stateless) CountMLP student
        # (train.distill.write_count_distilled_mm_dir)
        f_count = CountMLP(n_classes=len(classes),
                           batch_norm=meta.get("count_mlp_bn", True))
    if meta.get("image_f") == "tpu":
        from gridnext_tpu.models.tpu_f import tpu_f_arch_kwargs

        f_image = TpuPatchClassifier(n_classes=len(classes),
                                     **tpu_f_arch_kwargs(meta.get("tpu_f")))
    else:
        f_image = densenet121(num_classes=len(classes))
    # chunk f like training did (activation memory on real slides)
    mm_cls = (GridNetMM if meta.get("model") == "GridNetMM"
              else GridNetHexMM)
    return mm_cls(image_classifier=f_image, count_classifier=f_count,
                  n_classes=len(classes),
                  patch_chunk=meta.get("patch_chunk", 624),
                  count_chunk=meta.get("count_chunk"))


def grid_model_from_meta(meta, classes):
    """Grid (g) module for ANY trained model dir: count, image, or MM --
    the shared construction behind `evaluate` and the server's count
    service (register's branches inline the same choices; model.json is
    the single source of truth)."""
    model_name = meta.get("model", "")
    if model_name in ("GridNetHexMM", "GridNetMM"):
        return mm_model_from_meta(meta, classes)
    from gridnext_tpu.models import CountMLP, GridNet, GridNetHex

    square = meta.get("grid_dims") is not None
    if model_name.endswith("TpuPatchClassifier"):
        from gridnext_tpu.models import TpuPatchClassifier
        from gridnext_tpu.models.tpu_f import tpu_f_arch_kwargs

        f = TpuPatchClassifier(n_classes=len(classes),
                               **tpu_f_arch_kwargs(meta.get("tpu_f")))
        kw = {"patch_chunk": meta.get("patch_chunk", 624)}
    elif model_name.endswith("DenseNet121"):
        from gridnext_tpu.models import densenet121

        f = densenet121(num_classes=len(classes))
        kw = {"patch_chunk": meta.get("patch_chunk", 624)}
    else:
        f = CountMLP(n_classes=len(classes),
                     batch_norm=meta.get("count_mlp_bn", True))
        kw = {}
    cls = GridNet if square else GridNetHex
    return cls(patch_classifier=f, n_classes=len(classes), **kw)


def graph_model_from_meta(meta, classes):
    """HexGCN node classifier from a trained graph model dir's metadata
    (CLI ``train-graph``; width/depth come from model.json)."""
    from gridnext_tpu.models import HexGCN

    return HexGCN(n_classes=len(classes),
                  hidden=int(meta.get("hidden", 128)),
                  depth=int(meta.get("depth", 3)))


def validate_graph_feature_axis(meta, spaceranger_dir):
    """Refuse an array whose MEX gene axis differs from the trained one."""
    from gridnext_tpu.data.graph_data import feature_axis_signature

    want = meta.get("feature_axis")
    if not want:
        return
    got = feature_axis_signature(spaceranger_dir)
    if got != want:
        raise ValueError(
            f"{spaceranger_dir}: feature axis {got} does not match the "
            f"model's training axis {want}; graph node features need the "
            "exact transcriptome ordering the model trained on")


def scbert_count_transform(spaceranger_dirs, hd_binning, vocab: int):
    """gene2vec-space count preprocessing for a scBERT count-f.

    Unified caches index genes by feature ID (ENSEMBL); gene2vec uses
    symbols, so map IDs -> symbols via the first array's features.tsv.gz
    (read_feature_names), falling back to the raw IDs for symbol-indexed
    caches. Returns (transform, n_tokens): transform reindexes any
    (..., n_cohort_genes) count array into the (..., vocab) scBERT input
    space (depth-normalize + log2(1+x), llm/scbert.py:16-75 semantics).
    Raises ``ValueError`` when no cohort gene maps into the vocabulary.
    """
    import numpy as np

    from gridnext_tpu.io import unified_cache_path
    from gridnext_tpu.io.spaceranger import read_feature_names
    from gridnext_tpu.io.unify import read_unified_genes
    from gridnext_tpu.models.scbert import (load_gene2vec_names,
                                            preprocess_scbert)

    caches = [unified_cache_path(srd, hd_binning)
              for srd in spaceranger_dirs]
    # First cache only: cross-file gene-axis consistency is enforced by the
    # dataset constructors (train) / validated_unified_cache (register),
    # and re-reading every GB-scale gzip here doubled startup I/O at HD
    # scale.
    genes = read_unified_genes(caches[0])
    try:
        names = read_feature_names(spaceranger_dirs[0], hd_binning=hd_binning)
        sym_lut = names["gene_symbol"].to_dict()
        symbols = [str(sym_lut.get(g, g)) for g in genes]
    except Exception:
        symbols = [str(g) for g in genes]
    target = load_gene2vec_names()[:vocab]
    overlap = len(set(symbols) & set(target))
    if overlap == 0:
        raise ValueError(
            "no cohort gene symbols found in the gene2vec vocabulary -- "
            "scBERT inputs would be all zeros (check features.tsv.gz "
            "symbols / --scbert-vocab)")
    print(f"scBERT input space: {len(target)} gene2vec tokens, "
          f"{overlap}/{len(symbols)} cohort genes mapped")

    def transform(x):
        x = np.asarray(x, np.float32)
        flat = x.reshape(-1, x.shape[-1])
        out, _ = preprocess_scbert(flat, symbols, target_genes=target)
        return out.reshape(x.shape[:-1] + (len(target),))

    return transform, len(target)
