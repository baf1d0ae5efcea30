"""Generate docs/api.md: a compact public-API reference.

Walks the package's public modules, lists public classes/functions with
their signatures and first docstring line, and writes a single markdown
file. Run from the repo root::

    python tools/gen_api_docs.py

Kept as a checked-in generator (not a doc build system) so the reference
can be refreshed in one command whenever the surface changes; the output
is committed so users read it without running anything.
"""

from __future__ import annotations

import importlib
import inspect
import io
import os
import re
import sys

MODULES = [
    ("gridnext_tpu.geometry", "Visium lattice geometry (the L0 core)"),
    ("gridnext_tpu.io.spaceranger", "Spaceranger readers (positions v1/v2/HD, MEX, scalefactors)"),
    ("gridnext_tpu.io.annotations", "Loupe / Splotch annotation files"),
    ("gridnext_tpu.io.unify", "Cross-array count unification (.unified.tsv.gz contract)"),
    ("gridnext_tpu.io.anndata_io", "AnnData builders and converters (optional dep)"),
    ("gridnext_tpu.pipeline", "On-device image ETL: patch extraction, resize, normalization"),
    ("gridnext_tpu.data.datasets", "Dataset layer (count/image/MM spot + grid datasets, factory)"),
    ("gridnext_tpu.data.dense_ingest", "Visium HD dense ingest (train straight off decoded slides)"),
    ("gridnext_tpu.data.simulate", "Pseudo-Visium simulator (v1/v2/HD layouts)"),
    ("gridnext_tpu.data.graph_data", "Graph datasets (jraph-style hex adjacency)"),
    ("gridnext_tpu.data.template", "The real Visium v1 slide template (vendored barcode whitelist)"),
    ("gridnext_tpu.models", "Model zoo re-exports"),
    ("gridnext_tpu.models.densenet", "DenseNet-BC (checkpoint-parity image f)"),
    ("gridnext_tpu.models.tpu_f", "TpuPatchClassifier (MXU-shaped image f)"),
    ("gridnext_tpu.models.mlp", "CountMLP (tutorial count f)"),
    ("gridnext_tpu.models.gridnet", "GridNet family (hex/Cartesian correctors, MM fusion)"),
    ("gridnext_tpu.models.performer", "Performer / FAVOR+ linear attention"),
    ("gridnext_tpu.models.scbert", "scBERT (PerformerLM over the gene2vec vocabulary)"),
    ("gridnext_tpu.models.graph", "HexGCN graph model"),
    ("gridnext_tpu.ops.hexconv", "Hexagonal convolution (odd-right native)"),
    ("gridnext_tpu.ops.hexcorrector_pallas", "Fused Pallas hex corrector (+ on-chip argmax)"),
    ("gridnext_tpu.ops.patch_gather_pallas", "DMA-pipelined patch gather kernel"),
    ("gridnext_tpu.ops.favor", "FAVOR+ feature maps and linear attention"),
    ("gridnext_tpu.train.loops", "Training loops (spotwise/gridwise/MLM), checkpoints, resume"),
    ("gridnext_tpu.train.preempt", "Preemption handling (SIGTERM -> mid-epoch checkpoint)"),
    ("gridnext_tpu.train.distill", "Checkpoint-parity fast serving: f distillation into the TPU-shaped student"),
    ("gridnext_tpu.train.async_ckpt", "Off-thread checkpoint writes"),
    ("gridnext_tpu.train.orbax_io", "Orbax sharded checkpoints (mesh states)"),
    ("gridnext_tpu.parallel.mesh", "Device meshes, replication, batch sharding"),
    ("gridnext_tpu.parallel.multihost", "Multi-controller (pod-slice) clusters, per-process IO sharding"),
    ("gridnext_tpu.modeldir", "Trained model directories: model.json -> live models"),
    ("gridnext_tpu.evaluate", "Predictions, metrics, consensus, Loupe export"),
    ("gridnext_tpu.serving", "SlideRegistrar: jitted slide->labels serving + export artifacts"),
    ("gridnext_tpu.ingest", "SlideSource: overlapped decode/stage host ingest"),
    ("gridnext_tpu.server", "Resident HTTP registration server"),
    ("gridnext_tpu.plotting", "ROC/PR, confusion, label maps, hex renderers"),
    ("gridnext_tpu.workflows.pca", "PCA registration workflow"),
    ("gridnext_tpu.workflows.hvg", "Highly-variable-gene selection workflow"),
    ("gridnext_tpu.workflows.cv", "Cross-validation workflow"),
    ("gridnext_tpu.compat.torch_convert", "Torch checkpoint converters (DenseNet, hexagdly g)"),
    ("gridnext_tpu.compat.scbert_convert", "Torch scBERT/Performer checkpoint converter"),
    ("gridnext_tpu.observability", "Profiler traces, stage timers, metric logs"),
    ("gridnext_tpu.config", "Typed configuration dataclasses"),
    ("gridnext_tpu.native", "Native C++ tier (threaded gzip TSV codec, JPEG decode)"),
]


def _first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    for line in doc.split("\n"):
        if line.strip():
            # dataclass auto-docstrings repr default values; flax's module
            # _Sentinel repr embeds a memory address, which would make the
            # generated file differ run to run
            return re.sub(r" at 0x[0-9a-fA-F]+", "", line.strip())
    return ""


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"
    # default-value reprs (e.g. flax's module._Sentinel) can embed a memory
    # address, which would make the generated file differ run to run
    sig = re.sub(r" at 0x[0-9a-fA-F]+", "", sig)
    if len(sig) > 90:
        sig = sig[:87] + "...)"
    return sig


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        # only document symbols defined (or re-exported on purpose via
        # __all__) in this module -- skip incidental imports
        if getattr(mod, "__all__", None) is None:
            mod_name = getattr(obj, "__module__", None)
            if mod_name != mod.__name__:
                continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            out.append((n, obj))
    return out


def main(out_path="docs/api.md"):
    buf = io.StringIO()
    buf.write(
        "# API reference\n\n"
        "Generated by `python tools/gen_api_docs.py` -- one line per public "
        "symbol.\nFull behavior and parity citations live in each "
        "docstring; `docs/parity.md`\nmaps these symbols to their reference "
        "equivalents.\n")
    for mod_name, blurb in MODULES:
        mod = importlib.import_module(mod_name)
        members = _public_members(mod)
        if not members:
            continue
        buf.write(f"\n## `{mod_name}`\n\n{blurb}.\n\n")
        for n, obj in members:
            if inspect.isclass(obj):
                buf.write(f"- **`{n}`** (class) -- {_first_line(obj)}\n")
                for mn, m in inspect.getmembers(obj):
                    if mn.startswith("_") or not callable(m):
                        continue
                    if mn not in vars(obj):  # inherited; skip
                        continue
                    doc = _first_line(m)
                    if doc:
                        buf.write(f"  - `.{mn}{_signature(m)}` -- {doc}\n")
            else:
                buf.write(f"- `{n}{_signature(obj)}` -- {_first_line(obj)}\n")
    text = buf.getvalue()
    with open(out_path, "w") as fh:
        fh.write(text)
    n_lines = text.count("\n")
    print(f"wrote {out_path} ({n_lines} lines)")


if __name__ == "__main__":
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    sys.exit(main())
