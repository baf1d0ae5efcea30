"""Command-line interface: ``python -m gridnext_tpu <command>``.

The reference has no CLI (its workflows live in notebooks, SURVEY.md L6);
this thin layer scripts the common flows end to end:

  simulate     fabricate pseudo-Visium Spaceranger dirs (fixtures/demos)
  prepare      generate unified count files (+ optional patch caches)
  train-count  train CountMLP f (spotwise) then GridNetHex g on count grids
  train-graph  train the HexGCN node classifier over the cohort hex graph
  train-image  train DenseNet-121 f then GridNetHex g on patch caches
  train-mm     train multimodal GridNetHexMM (count-f + image-f, concat;
               --count-f scbert swaps in a gene2vec-space scBERT count-f)
  register     load a trained checkpoint and write Loupe CSVs per array
  evaluate     metrics for a trained model over annotated arrays (JSON:
               acc / per-class + macro AUROC/AUPRC / confusion; --plots
               renders the ROC/PR grid and confusion heatmap)
  export       serialize a model's registration pipeline to StableHLO
  serve-artifact  register slides from an exported artifact, model-free
  serve        resident HTTP server: model loaded + compiled once,
               slides registered per request (server.py)

Example:
  python -m gridnext_tpu simulate --out /tmp/demo --arrays 4
  python -m gridnext_tpu train-count --spaceranger /tmp/demo/a* \\
      --annots /tmp/demo/a*/*_annotations.csv --out /tmp/demo/model
  python -m gridnext_tpu register --spaceranger /tmp/demo/a0 \\
      --model /tmp/demo/model --out /tmp/demo/a0_loupe.csv
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# meta -> model construction lives in modeldir.py (shared with the resident
# server, server.py); the private aliases remain for in-repo callers/tests
from gridnext_tpu.modeldir import (
    grid_model_from_meta as _grid_model_from_meta,
    image_registrar_from_meta as _image_registrar_from_meta,
    load_model_dir as _load_model_dir,
    mm_model_from_meta as _mm_model_from_meta,
)


def _train_augment(args):
    """--augment -> the train-step augmentation hook (image commands)."""
    if not getattr(args, "augment", False):
        return None
    from gridnext_tpu.pipeline import make_train_augment

    return make_train_augment()


def _primary_writer() -> bool:
    """Whether THIS process owns the command's file outputs.

    Multi-controller runs (--multihost) execute the same command on every
    pod host; model checkpoints / model.json must be written once, by the
    primary, or same-path writes race on the shared filesystem (the
    trainers gate their own epoch checkpoints the same way). Always true
    single-process."""
    import jax

    if jax.process_count() == 1:
        return True
    from gridnext_tpu.parallel import is_primary

    return is_primary()


def _cmd_simulate(args):
    from gridnext_tpu.data import simulate_spaceranger_dir

    kw = {}
    if args.gene2vec_names:
        # draw gene symbols from the vendored gene2vec vocabulary so the
        # cohort flows into the scBERT commands (pretrain-scbert /
        # train-mm --count-f scbert), whose input space is gene2vec
        from gridnext_tpu.models.scbert import load_gene2vec_names

        # the FIRST n symbols, so any --scbert-vocab >= --genes (which
        # truncates the vocabulary from the front) maps every gene
        kw["gene_names"] = list(load_gene2vec_names()[:args.genes])
    if args.hd_grid is not None:
        kw.update(spaceranger_version="hd", hd_grid=tuple(args.hd_grid),
                  hd_binning=args.hd_binning)
    if args.barcodes != "synthetic":
        if args.hd_grid is not None:
            sys.exit("error: --barcodes visium_v1 applies to the 78x64 "
                     "Visium lattice, not HD bin grids")
        kw["barcodes"] = args.barcodes
    os.makedirs(args.out, exist_ok=True)
    for i in range(args.arrays):
        sim = simulate_spaceranger_dir(
            os.path.join(args.out, f"a{i}"), seed=args.seed + i,
            n_genes=args.genes, n_classes=args.classes, image=args.image, **kw)
        print(f"simulated {sim['spaceranger_dir']} "
              f"(annotations: {sim['annot_file']})")


def _require_one_image_per_dir(images, spaceranger_dirs):
    if not images or len(images) != len(spaceranger_dirs):
        sys.exit("error: --images must list one fullres image per "
                 "--spaceranger directory")


def _cmd_prepare(args):
    from gridnext_tpu.io import prepare_count_files, unified_count_suffix

    written = prepare_count_files(args.spaceranger,
                                  unified_count_suffix(args.hd_binning),
                                  minimum_detection_rate=_min_detection(args),
                                  hd_binning=args.hd_binning)
    for w in written:
        print(f"wrote {w}")
    if args.images:
        from gridnext_tpu.pipeline import patch_cache_suffix, save_visium_patches

        # validate BEFORE the expensive extraction: a cache train-image
        # would refuse (patch < 32, window < patch) must not be built
        _check_image_args(args)
        h_st = w_st = None
        window_px = getattr(args, "window_px", None)
        if args.hd_binning is not None:
            # COHORT-max lattice dims, exactly like the factory's
            # grid_dims='auto' -- per-array dims would name caches the
            # factory never looks for
            from gridnext_tpu.io.spaceranger import cohort_hd_lattice_dims

            h_st, w_st = cohort_hd_lattice_dims(args.spaceranger,
                                                args.hd_binning)
        # shared cache-naming contract with the dataset factory
        suffix = patch_cache_suffix(
            patch_size_px=args.patch_px, window_size_px=window_px,
            hd_binning=args.hd_binning,
            hd_dims=(h_st, w_st) if args.hd_binning is not None else None)
        from gridnext_tpu.io.unify import array_name

        for srd, im in zip(args.spaceranger, args.images):
            pdir = os.path.join(srd, array_name(srd) + suffix)
            save_visium_patches(im, srd, pdir, patch_size=args.patch_px,
                                window_size=window_px,
                                hd_binning=args.hd_binning, h_st=h_st, w_st=w_st)
            print(f"wrote {pdir}")


def _split_dls(dataset, val_den: int, stream: bool, transform=None,
               val_if_single: bool = True, seed: int = 0, val_arrays=None):
    """Shuffled train/val split as loop-ready dataloaders.

    ``stream=True`` -> lazy Subset views (one batch resident at a time);
    otherwise materialized arrays (``transform`` applied whole-cohort).
    ``val_den``: validation fraction denominator (len // val_den items).
    ``seed`` varies the random split; ``val_arrays`` (array names, e.g. the
    Spaceranger dir basenames) pins validation to whole held-out arrays
    instead -- grid items AND their spots route by source array, the
    notebooks' held-out-section protocol. The single shared split policy of
    every train-* command.
    """
    import numpy as np

    from gridnext_tpu.data import Subset

    rng = np.random.default_rng(seed)
    n = len(dataset)
    if val_arrays:
        from pathlib import Path

        names = set(val_arrays)
        is_val = np.array([bool(names & set(Path(s).parts))
                           for s in dataset.source_ids()])
        if not is_val.any():
            sys.exit(f"error: --val-arrays {sorted(names)} matched no "
                     "items (names must be array dir basenames)")
        if is_val.all():
            sys.exit("error: --val-arrays matched every item; "
                     "nothing left to train on")
        order = np.concatenate([rng.permutation(np.flatnonzero(is_val)),
                                rng.permutation(np.flatnonzero(~is_val))])
        n_val = int(is_val.sum())
    else:
        order = rng.permutation(n)
        n_val = (max(1, n // val_den)
                 if (val_if_single or n > 1) else 0)
    if stream:
        return {"train": Subset(dataset, order[n_val:], transform),
                "val": Subset(dataset, order[:n_val], transform)
                if n_val else None}
    X, Y = dataset.materialize()
    if transform is not None:
        X = transform(X)
    multi = isinstance(X, tuple)
    X = tuple(a[order] for a in X) if multi else X[order]
    Y = Y[order]

    def part(sl):
        return (tuple(a[sl] for a in X) if multi else X[sl]), Y[sl]

    return {"train": part(slice(n_val, None)),
            "val": part(slice(None, n_val)) if n_val else None}


def _first_sample(dls):
    """Leading-1 model-init sample from a dataloader's train split (the
    shared loader-form handling, incl. the cheap sample_item() path for
    streaming grids, lives in train.loops._sample_input)."""
    from gridnext_tpu.train.loops import _sample_input

    return _sample_input(dls["train"])


def _train_fg(args, f, grids, spots, meta_extra, patch_chunk=None,
              transform=None, stream: bool = False, corrector: str = "hex"):
    """Shared f-spotwise + g-gridwise training flow for the train-* commands.

    ``stream=True`` feeds the loops lazy Subset views (one batch resident at
    a time) instead of materialized cohorts -- the image path's patch grids
    are ~1 GB/array at 128px, so cohort size stays disk-bound, not RAM-bound.
    ``corrector`` picks the g-network: 'hex' (Visium pseudo-hex lattices) or
    'square' (the Cartesian GridNet corrector -- right for HD square bins).
    """
    import jax

    from gridnext_tpu.models import GridNet, GridNetHex
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, save_checkpoint,
                                    train_gridwise, train_spotwise)

    classes = list(grids.classes)
    # dense ingest has no spotwise stage: --batch-size is unused there, so
    # don't reject it against the mesh
    mesh_shape = _checked_mesh_shape(
        args, spot_batch=args.batch_size if spots is not None else None,
        grid_batch=args.grid_batch_size)
    spot_desc = ("joint f+g (dense ingest)" if spots is None
                 else f"{len(spots)} spots")
    print(f"{spot_desc}, {len(grids)} arrays, classes: {classes}"
          + (" [streaming]" if stream else "")
          + (f" [mesh {mesh_shape}]" if mesh_shape else ""))

    os.makedirs(args.out, exist_ok=True)
    f_out = os.path.join(args.out, "f_state.msgpack")
    g_out = os.path.join(args.out, "g_state.msgpack")

    # shuffled stratification-friendly split (file order is spatially sorted)
    split_kw = dict(seed=getattr(args, 'split_seed', 0),
                    val_arrays=getattr(args, 'val_arrays', None))
    f_state = None
    if spots is not None:
        dls_f = _split_dls(spots, 5, stream, transform, **split_kw)
        f_state, *_ = train_spotwise(
            f, dls_f, learning_rate=args.f_lr, num_epochs=args.epochs,
            batch_size=args.batch_size, verbose=True, mesh_shape=mesh_shape,
            outfile=f_out, resume=_resume_path(args, f_out),
            augment=_train_augment(args))

    g_cls = GridNet if corrector == "square" else GridNetHex
    g = g_cls(patch_classifier=f, n_classes=len(classes),
              patch_chunk=patch_chunk)
    # dense ingest has no spotwise stage: every grid step already batches
    # the full bin lattice through f, so f trains jointly with g instead
    joint_f = args.finetune_f or spots is None
    tx = make_gridwise_optimizer(args.g_lr,
                                 f_lr=args.f_lr if joint_f else None)
    dls = _split_dls(grids, 4, stream, transform, val_if_single=False,
                     **split_kw)
    state = create_train_state(g, jax.random.key(0), _first_sample(dls), tx)
    if f_state is not None:
        state = load_f_params(state, f_state.variables())
    state, *_ = train_gridwise(g, dls, state=state, tx=tx,
                               num_epochs=args.epochs, verbose=True,
                               batch_size=args.grid_batch_size,
                               mesh_shape=mesh_shape,
                               outfile=g_out, resume=_resume_path(args, g_out),
                               augment=_train_augment(args))

    if _primary_writer():
        save_checkpoint(g_out, state)
        with open(os.path.join(args.out, "model.json"), "w") as fh:
            json.dump({"classes": classes, **meta_extra}, fh)
        print(f"saved model to {args.out}")


def _validated_count_cache(srd, meta):
    """Path of ``srd``'s unified count cache, verified to exist and (when
    the model recorded its training genes) to carry that exact gene axis
    (io.unify.validated_unified_cache, mapped to a CLI exit)."""
    from gridnext_tpu.io.unify import validated_unified_cache

    try:
        return validated_unified_cache(srd, meta.get("hd_binning"),
                                       genes=meta.get("genes"))
    except (FileNotFoundError, ValueError) as e:
        sys.exit(f"error: {e}")


_MIN_DETECTION_DEFAULT = 0.02


def _min_detection(args):
    """--min-detection resolved to its effective value. The argparse default
    is None (not 0.02) so _warn_existing_caches can tell a user-passed flag
    from the default and only warn when the flag would actually be ignored."""
    v = getattr(args, "min_detection", None)
    return _MIN_DETECTION_DEFAULT if v is None else v


def _warn_existing_caches(args, suffix_paths):
    if args.min_detection is not None and all(os.path.exists(c)
                                              for c in suffix_paths):
        print(f"note: unified count caches already exist -- --min-detection "
              f"has no effect on them (delete *.unified.tsv.gz to refilter)")


def _resume_path(args, outfile):
    """Under --resume, the '.latest' continuation checkpoint for ``outfile``
    if one exists (a run killed before its first epoch end restarts clean).
    A completed stage resumes to a no-op: epochs_done == --epochs, so the
    trainer returns the restored best state without recomputing."""
    if not getattr(args, "resume", False):
        return None
    p = str(outfile) + ".latest"
    return p if os.path.exists(p) else None


def _checked_mesh_shape(args, *, spot_batch=None, grid_batch=None,
                        mlm_batch=None):
    """Parse --mesh and fail FAST on batch/mesh divisibility.

    The trainers validate inside train_spotwise/train_gridwise, but the g
    stage only starts after f has fully trained -- an incompatible
    --grid-batch-size would waste the whole f run before erroring. The
    incompatibility is knowable from args alone, so check it up front.
    """
    mesh_shape = _parse_mesh(args)
    if mesh_shape is None:
        return None
    from gridnext_tpu.train.loops import _mesh_placement, _resolve_mesh

    try:
        mesh = _resolve_mesh(None, mesh_shape)
        if spot_batch is not None:
            _mesh_placement(mesh, "spot", spot_batch)
        if grid_batch is not None:
            _mesh_placement(mesh, "grid", grid_batch)
        if mlm_batch is not None:
            _mesh_placement(mesh, "mlm", mlm_batch)
    except ValueError as e:
        sys.exit(f"error: {e} (adjust --batch-size / --grid-batch-size "
                 "before training starts)")
    return mesh_shape


def _check_dense_ingest_args(args, grid_dims):
    """Shared --dense-ingest preconditions (train-image and train-mm)."""
    if grid_dims is None:
        sys.exit("error: --dense-ingest needs a square HD bin lattice "
                 "(--grid-dims / --hd-binning); Visium pseudo-hex "
                 "spots don't tile the slide")
    if args.window_px is not None and args.window_px != args.patch_px:
        sys.exit("error: --dense-ingest extracts whole bins (window == "
                 "pitch == --patch-px); drop --window-px or use the "
                 "cache-based pipeline")


def _parse_mesh(args):
    """--mesh 'data=4,spot=2' | 'auto' -> the trainers' mesh_shape value."""
    spec = getattr(args, "mesh", None)
    if spec is None:
        return None
    spec = spec.lower()
    if spec == "auto":
        return "auto"
    try:
        shape = {}
        for part in spec.split(","):
            name, size = part.split("=")
            shape[name.strip()] = int(size)
        if not shape or any(s <= 0 for s in shape.values()):
            raise ValueError
        return shape
    except ValueError:
        sys.exit(f"error: --mesh must be 'auto' or like 'data=4,spot=2' "
                 f"(positive axis sizes); got {spec!r}")


def _parse_grid_dims(spec):
    """'auto' | 'HxW' -> the factory's grid_dims value (None passes through)."""
    if spec is None:
        return None
    spec = spec.lower()
    if spec == "auto":
        return "auto"
    try:
        h, w = spec.split("x")
        return (int(h), int(w))
    except ValueError:
        sys.exit(f"error: --grid-dims must be 'auto' or HxW; got {spec!r}")


def _parse_hd_args(args, require_dims: bool, what: str = "training"):
    """(hd_binning, grid_dims) with the shared validation: --grid-dims needs
    --hd-binning; image/MM flows additionally need dims for any HD run."""
    hd_binning = getattr(args, "hd_binning", None)
    grid_dims = _parse_grid_dims(getattr(args, "grid_dims", None))
    if grid_dims is not None and hd_binning is None:
        sys.exit("error: --grid-dims requires --hd-binning")
    if require_dims and hd_binning is not None and grid_dims is None:
        sys.exit(f"error: --hd-binning {what} needs --grid-dims "
                 "(the square HD bin lattice the patch grid is indexed by)")
    return hd_binning, grid_dims


def _cmd_train_count(args):
    import numpy as np

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.io import unified_cache_path
    from gridnext_tpu.models import CountMLP

    hd_binning, grid_dims = _parse_hd_args(args, require_dims=False)
    caches = [unified_cache_path(s, hd_binning) for s in args.spaceranger]
    _warn_existing_caches(args, caches)
    kw = dict(annot_files=args.annots, use_count=True, use_image=False,
              minimum_detection_rate=_min_detection(args),
              hd_binning=hd_binning)
    spots = create_visium_dataset(args.spaceranger, spatial=False, **kw)
    grids = create_visium_dataset(args.spaceranger, spatial=True,
                                  grid_dims=grid_dims, **kw)

    from gridnext_tpu.io.unify import read_unified_genes

    genes = read_unified_genes(caches[0])

    # square HD lattices get the Cartesian corrector (hex taps assume the
    # Visium pseudo-hex packing)
    square = grid_dims is not None
    f = CountMLP(n_classes=len(grids.classes))
    _train_fg(args, f, grids, spots,
              {"n_genes": len(genes), "genes": genes, "log1p": True,
               "hd_binning": hd_binning,
               "grid_dims": ([grids.h_st, grids.w_st] if square else None),
               "model": ("GridNet+CountMLP" if square
                         else "GridNetHex+CountMLP")},
              transform=np.log1p, corrector="square" if square else "hex")


def _cmd_train_graph(args):
    """Node-classification training over the cohort hex graph (HexGCN).

    The graph tier's training surface: the reference ships only
    torch_geometric containers (graph_datasets.py:18-179) with no model or
    training loop; here the cohort's arrays become ONE node-offset hex
    graph (data.graph_data.visium_to_graphdata: spots as nodes, O(N) hex
    adjacency), padded to a jit-static shape, and the segment-sum HexGCN
    trains full-batch for --steps updates. The saved dir round-trips
    through ``register`` and ``evaluate`` like every other model dir."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gridnext_tpu.data.graph_data import (feature_axis_signature,
                                              pad_graph, visium_to_graphdata)
    from gridnext_tpu.models import HexGCN, graph_node_loss
    from gridnext_tpu.train import TrainState, save_checkpoint

    if len(args.annots) != len(args.spaceranger):
        sys.exit("error: need one --annots file per --spaceranger dir")
    # keep_unannotated: train on the FULL in-tissue lattice with unlabeled
    # nodes masked from the loss (graph_node_loss y=-1), so the trained
    # message-passing sees the same adjacency that unannotated serving
    # (`register`) runs on -- annotated-only graphs have sparser
    # neighborhoods whenever annotation coverage is partial
    gd = visium_to_graphdata(args.spaceranger, annot_files=args.annots,
                             keep_unannotated=True)
    classes = [str(c) for c in gd["classes"]]
    n_real = gd["nodes"].shape[0]
    n_labeled = int((gd["y"] >= 0).sum())
    n_real_edges = gd["edges"].shape[1]
    # pad to a static shape (jit compiles once; padding edges self-loop on
    # a padding node, so real nodes never receive padding messages)
    gd = pad_graph(gd, ((n_real + 127) // 128) * 128 + 128)
    print(f"{n_labeled} annotated of {n_real} in-tissue spots across "
          f"{len(args.spaceranger)} arrays, {n_real_edges} edges, "
          f"classes: {classes}")

    nodes = jnp.asarray(np.log1p(gd["nodes"]))
    edges = jnp.asarray(gd["edges"])
    y = jnp.asarray(gd["y"])
    mask = jnp.asarray(gd["node_mask"])

    model = HexGCN(n_classes=len(classes), hidden=args.hidden,
                   depth=args.depth)
    params = model.init(jax.random.key(args.seed), nodes, edges)["params"]
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            loss, corr, n = graph_node_loss(
                model.apply({"params": p}, nodes, edges), y, mask)
            return loss, (corr, n)

        (loss, (corr, n)), grads = jax.value_and_grad(lf, has_aux=True)(
            params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt, loss,
                corr / jnp.maximum(n, 1))

    for i in range(args.steps):
        params, opt, loss, acc = step(params, opt)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"node acc {float(acc):.3f}")

    os.makedirs(args.out, exist_ok=True)
    state = TrainState(params=params, batch_stats=None, opt_state=opt,
                       step=jnp.asarray(args.steps, jnp.int32),
                       extra_vars={})
    save_checkpoint(os.path.join(args.out, "g_state.msgpack"), state)
    with open(os.path.join(args.out, "model.json"), "w") as fh:
        json.dump({"classes": classes, "model": "HexGCN",
                   "hidden": args.hidden, "depth": args.depth,
                   "log1p": True, "n_genes": int(nodes.shape[1]),
                   "feature_axis":
                       feature_axis_signature(args.spaceranger[0])}, fh)
    print(f"saved model to {args.out}")


def _check_image_args(args):
    _require_one_image_per_dir(args.images, args.spaceranger)
    if args.patch_px < 32:
        sys.exit("error: --patch-px must be >= 32 (densenet121 downsamples "
                 "by 32x, TpuPatchClassifier by 16x then 2x; smaller patches "
                 "collapse to zero spatial size)")
    if getattr(args, "window_px", None) is not None \
            and args.window_px < args.patch_px:
        sys.exit("error: --window-px must be >= --patch-px (the window is "
                 "cropped around each spot then resized DOWN to the patch "
                 "size; upsampling a smaller window is never what you want)")


def _cmd_train_image(args):
    import jax.numpy as jnp

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.models import TpuPatchClassifier, densenet121

    _check_image_args(args)
    hd_binning, grid_dims = _parse_hd_args(args, require_dims=True,
                                           what="image training")
    if args.dense_ingest:
        # HD bins tile the slide (pitch == bin size): the whole training
        # grid is one reshape of the decoded slide -- no patch cache, no
        # spotwise stage (each grid step already batches every bin
        # through f, so f trains jointly with g). data/dense_ingest.py.
        from gridnext_tpu.data import DenseWSIGridDataset

        _check_dense_ingest_args(args, grid_dims)
        spots = None
        grids = DenseWSIGridDataset(args.images, args.spaceranger,
                                    args.annots, patch_size=args.patch_px,
                                    hd_binning=hd_binning,
                                    grid_dims=grid_dims)
    else:
        kw = dict(annot_files=args.annots, use_count=False, use_image=True,
                  fullres_image_files=args.images,
                  patch_size_px=args.patch_px,
                  window_size_px=args.window_px, hd_binning=hd_binning)
        spots = create_visium_dataset(args.spaceranger, spatial=False,
                                      grid_dims=grid_dims, **kw)
        grids = create_visium_dataset(args.spaceranger, spatial=True,
                                      grid_dims=grid_dims, **kw)

    square = grid_dims is not None  # Cartesian corrector on HD bin lattices
    g_name = "GridNet" if square else "GridNetHex"
    dtype = jnp.bfloat16 if args.bf16 else None
    tpu_f_meta = None
    if args.f == "tpu":
        # MXU-shaped f: 3.6x DenseNet patch throughput (models/tpu_f.py)
        from gridnext_tpu.models.tpu_f import tpu_f_arch_meta

        f = TpuPatchClassifier(n_classes=len(grids.classes), dtype=dtype)
        tpu_f_meta = tpu_f_arch_meta(f)  # survives default-shape changes
        model_name = f"{g_name}+TpuPatchClassifier"
    else:
        f = densenet121(num_classes=len(grids.classes), dtype=dtype)
        model_name = f"{g_name}+DenseNet121"
        if args.dense_ingest:
            # f always runs eval-mode inside GridNet (training.py:126
            # semantics), and dense ingest has no spotwise stage to learn
            # BN running stats -- a from-scratch DenseNet would normalize
            # with its (0, 1) init stats for the whole run.
            print("warning: --dense-ingest trains f jointly with g (no "
                  "spotwise stage), but DenseNet's BatchNorm runs in eval "
                  "mode inside GridNet, so from-scratch running stats stay "
                  "at their (mean 0, var 1) init. Prefer '--f tpu' "
                  "(LayerNorm, immune) or start from a pretrained f.",
                  file=sys.stderr)
    _train_fg(args, f, grids, spots,
              {"patch_px": args.patch_px, "window_px": args.window_px,
               "model": model_name, "tpu_f": tpu_f_meta,
               "image_f": args.f, "hd_binning": hd_binning,
               "grid_dims": ([grids.h_st, grids.w_st] if square else None),
               "patch_chunk": args.patch_chunk,
               "dense_ingest": bool(args.dense_ingest)},
              patch_chunk=args.patch_chunk, stream=not args.no_stream,
              corrector="square" if square else "hex")


def _scbert_count_transform(spaceranger_dirs, hd_binning, vocab: int):
    """modeldir.scbert_count_transform, mapped to a CLI exit (the zero-
    overlap failure is a user-input error worth a clean message)."""
    from gridnext_tpu.modeldir import scbert_count_transform

    try:
        return scbert_count_transform(spaceranger_dirs, hd_binning, vocab)
    except ValueError as e:
        sys.exit(f"error: {e}")


def _load_scbert_ckpt(path, depth: int):
    """scBERT starting weights: a torch .pth/.pt checkpoint (converted on the
    fly via compat.scbert_convert) or a flax-msgpack file (either a raw
    variables dict or a TrainState checkpoint written by this CLI)."""
    if str(path).endswith((".pth", ".pt")):
        import torch

        from gridnext_tpu.compat.scbert_convert import scbert_from_torch

        # only plain state-dicts are supported content (scbert_from_torch),
        # so refuse arbitrary pickle execution from a user-supplied path
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        variables, _ = scbert_from_torch(sd, depth=depth)
        return variables
    from gridnext_tpu.train import load_checkpoint

    payload = load_checkpoint(path)
    variables = {"params": payload["params"]}
    for k, v in (payload.get("extra_vars") or {}).items():
        variables[k] = v
    for k in ("favor",):  # raw variables-dict form
        if k in payload:
            variables[k] = payload[k]
    params = variables.get("params") or {}
    if "performer_lm" not in params and (
            "token_emb" in params or "performer" in params):
        # raw-PerformerLM tree (a `train_mlm` / pretrain-scbert pretraining
        # checkpoint): nest every collection under scBERT's 'performer_lm'
        # scope so the merge lands; the LM's own to_out/tie-embed output
        # head has no scBERT analog and drops away while the fresh
        # AttentionClassifier head initializes -- the reference's head-swap
        # protocol (llm/scbert.py:110-122)
        variables = {k: {"performer_lm": v} for k, v in variables.items()}
    return variables


def _merge_matching_params(dst, src, skipped, path=""):
    """Recursively take ``src`` leaves whose shapes match ``dst``; keep the
    fresh init (and record the path) otherwise -- so a pretrained checkpoint
    with a different classifier head or a truncated --scbert-vocab loads the
    compatible weights and re-initializes the rest, the reference's
    fine-tune protocol (llm/scbert.py:110-122 swaps the head)."""
    import numpy as np

    if isinstance(dst, dict):
        out = {}
        for k, v in dst.items():
            if isinstance(src, dict) and k in src:
                out[k] = _merge_matching_params(v, src[k], skipped,
                                                f"{path}/{k}")
            else:
                skipped.append(f"{path}/{k} (missing)")
                out[k] = v
        return out
    if np.shape(dst) == np.shape(src):
        return np.asarray(src)
    skipped.append(f"{path} (shape {np.shape(src)} != {np.shape(dst)})")
    return dst


def _cmd_train_mm(args):
    """Multimodal: per-modality f spotwise, then the MM g gridwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.models import (CountMLP, GridNetHexMM, GridNetMM,
                                     TpuPatchClassifier, densenet121)
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, save_checkpoint,
                                    train_gridwise, train_spotwise)

    _check_image_args(args)
    hd_binning, grid_dims = _parse_hd_args(args, require_dims=True,
                                           what="multimodal training")
    if args.dense_ingest:
        # HD bins tile the slide: the image modality's training grids come
        # straight off the decoded slides (no per-bin JPEG cache), stacked
        # with the count grids. The image f has no cached spot patches to
        # pretrain on, so it trains jointly with g (data/dense_ingest.py;
        # same contract as train-image --dense-ingest).
        from gridnext_tpu.data import DenseWSIGridDataset, MMStackDataset

        _check_dense_ingest_args(args, grid_dims)
        img_grids = DenseWSIGridDataset(args.images, args.spaceranger,
                                        args.annots,
                                        patch_size=args.patch_px,
                                        hd_binning=hd_binning,
                                        grid_dims=grid_dims)
        count_grids = create_visium_dataset(
            args.spaceranger, spatial=True, use_count=True, use_image=False,
            annot_files=args.annots,
            minimum_detection_rate=_min_detection(args),
            hd_binning=hd_binning,
            grid_dims=(img_grids.h_st, img_grids.w_st))
        mm_grids = MMStackDataset(img_grids, count_grids)
        image_spots = None
    else:
        kw = dict(annot_files=args.annots,
                  minimum_detection_rate=_min_detection(args),
                  fullres_image_files=args.images,
                  patch_size_px=args.patch_px,
                  window_size_px=args.window_px, hd_binning=hd_binning)
        mm_grids = create_visium_dataset(args.spaceranger, spatial=True,
                                         use_count=True, use_image=True,
                                         grid_dims=grid_dims, **kw)
        image_spots = create_visium_dataset(args.spaceranger, spatial=False,
                                            use_count=False, use_image=True,
                                            annot_files=args.annots,
                                            fullres_image_files=args.images,
                                            patch_size_px=args.patch_px,
                                            window_size_px=args.window_px,
                                            hd_binning=hd_binning,
                                            grid_dims=grid_dims)
    count_spots = create_visium_dataset(args.spaceranger, spatial=False,
                                        use_count=True, use_image=False,
                                        annot_files=args.annots,
                                        minimum_detection_rate=_min_detection(args),
                                        hd_binning=hd_binning)
    classes = list(mm_grids.classes)
    n_classes = len(classes)
    stream = not getattr(args, "no_stream", False)
    mesh_shape = _checked_mesh_shape(args, spot_batch=args.batch_size,
                                     grid_batch=args.grid_batch_size)
    print(f"{len(count_spots)} count spots, "
          + (f"{len(image_spots)} image spots, " if image_spots is not None
             else "dense image ingest, ")
          + f"{len(mm_grids)} arrays, classes: {classes}"
          + (" [streaming]" if stream else "")
          + (f" [mesh {mesh_shape}]" if mesh_shape else ""))

    os.makedirs(args.out, exist_ok=True)
    split_kw = dict(seed=getattr(args, 'split_seed', 0),
                    val_arrays=getattr(args, 'val_arrays', None))

    def spot_train(f, spots, transform=None, stream_spots=stream,
                   name="f_state", state=None, tx=None, augment=None):
        f_out = os.path.join(args.out, f"{name}.msgpack")
        state, *_ = train_spotwise(
            f, _split_dls(spots, 5, stream_spots, transform, **split_kw),
            learning_rate=args.f_lr, num_epochs=args.epochs,
            batch_size=args.batch_size, verbose=True, mesh_shape=mesh_shape,
            state=state, tx=tx,
            outfile=f_out, resume=_resume_path(args, f_out), augment=augment)
        return state

    frozen_f = None  # per-subtree freeze carried into the joint g stage
    if args.count_f == "scbert":
        # transformer count-f: the multimodal_model_test.py stack. Counts
        # reindex into the gene2vec space; the scBERT forward bins them.
        from gridnext_tpu.models import scBERT

        count_transform, vocab = _scbert_count_transform(
            args.spaceranger, hd_binning, args.scbert_vocab)
        f_count = scBERT(n_genes=vocab, dim=args.scbert_dim,
                         depth=args.scbert_depth, heads=args.scbert_heads,
                         dim_head=args.scbert_dim_head,
                         nb_features=args.scbert_features,
                         n_classes=n_classes, generalized_attention=True)
        # transformer activations dwarf the image-f's per spot; chunk small
        count_chunk = 8 if args.count_chunk is None else args.count_chunk
        if args.scbert_ckpt or args.scbert_finetune:
            # pretrained start + the reference's fine-tune freeze policy
            # (final norm + last-but-one layer + head, llm/scbert.py:124-132)
            import optax

            from gridnext_tpu.models.scbert import finetune_param_labels

            tx_f = optax.adam(args.f_lr)
            if args.scbert_finetune:
                scbert_labels = lambda params: finetune_param_labels(  # noqa: E731
                    params, args.scbert_depth)
                tx_f = optax.multi_transform(
                    {"train": optax.adam(args.f_lr),
                     "frozen": optax.set_to_zero()},
                    scbert_labels)
                # carry the freeze into the joint gridwise stage too: the
                # count_classifier subtree must not fall back to plain adam
                # there (make_gridwise_optimizer would otherwise train every
                # pretrained scBERT parameter when f trains jointly with g)
                frozen_f = {"count_classifier": scbert_labels}
            f_count_state0 = create_train_state(
                f_count, jax.random.key(0),
                jnp.zeros((1, vocab), jnp.float32), tx_f)
            if args.scbert_ckpt:
                loaded = _load_scbert_ckpt(args.scbert_ckpt,
                                           args.scbert_depth)
                skipped = []
                params = _merge_matching_params(
                    f_count_state0.params, loaded.get("params", {}), skipped)
                extra = dict(f_count_state0.extra_vars or {})
                for k, v in loaded.items():
                    if k in ("params", "batch_stats"):
                        continue
                    extra[k] = (_merge_matching_params(extra[k], v, skipped,
                                                       path=f"[{k}]")
                                if k in extra else v)
                f_count_state0 = f_count_state0.replace(params=params,
                                                        extra_vars=extra)
                print("scBERT checkpoint: "
                      + ("all parameters loaded" if not skipped else
                         f"{len(skipped)} entries re-initialized "
                         "(head swap / vocab or attention-geometry "
                         f"mismatch): {skipped[:3]}"))
            f_count_kw = dict(state=f_count_state0, tx=tx_f)
        else:
            f_count_kw = {}
    else:
        count_transform, vocab = np.log1p, None
        f_count = CountMLP(n_classes=n_classes)
        count_chunk = args.count_chunk
        f_count_kw = {}
    # Counts always materialize: streaming count spots does globally-shuffled
    # per-spot reads through a 4-entry frame LRU, so cohorts >4 arrays would
    # re-parse a full gzip TSV per spot per epoch (see the cohort-cache note
    # in data/datasets.py). Count cohorts are small in RAM; only image spots
    # and MM grids benefit from streaming.
    f_count_state = spot_train(f_count, count_spots, count_transform,
                               stream_spots=False, name="f_count_state",
                               **f_count_kw)
    dtype = jnp.bfloat16 if args.bf16 else None
    tpu_f_meta = None
    if args.f == "tpu":
        from gridnext_tpu.models.tpu_f import tpu_f_arch_meta

        f_image = TpuPatchClassifier(n_classes=n_classes, dtype=dtype)
        tpu_f_meta = tpu_f_arch_meta(f_image)
    else:
        f_image = densenet121(num_classes=n_classes, dtype=dtype)
    # dense ingest has no cached spot patches for an image-f spotwise stage:
    # the image f starts from init and trains jointly with g below
    f_image_state = (spot_train(f_image, image_spots, name="f_image_state",
                                augment=_train_augment(args))
                     if image_spots is not None else None)

    square = grid_dims is not None  # Cartesian corrector on HD bin lattices
    mm_cls = GridNetMM if square else GridNetHexMM
    g = mm_cls(image_classifier=f_image, count_classifier=f_count,
               n_classes=n_classes, patch_chunk=args.patch_chunk,
               count_chunk=count_chunk)
    # transform the count modality only; image grids pass through
    mm_transform = lambda x: (x[0], count_transform(x[1]))  # noqa: E731
    dls = _split_dls(mm_grids, 4, stream, mm_transform, val_if_single=False,
                     **split_kw)
    joint_f = args.finetune_f or f_image_state is None
    tx = make_gridwise_optimizer(args.g_lr,
                                 f_lr=args.f_lr if joint_f else None,
                                 frozen_f_labels=frozen_f)
    state = create_train_state(g, jax.random.key(0), _first_sample(dls), tx)
    if f_image_state is not None:
        state = load_f_params(state, f_image_state.variables(),
                              key="image_classifier")
    state = load_f_params(state, f_count_state.variables(),
                          key="count_classifier")
    g_out = os.path.join(args.out, "g_state.msgpack")
    state, *_ = train_gridwise(g, dls, state=state, tx=tx,
                               num_epochs=args.epochs, verbose=True,
                               batch_size=args.grid_batch_size,
                               mesh_shape=mesh_shape,
                               outfile=g_out, resume=_resume_path(args, g_out),
                               augment=_train_augment(args))

    if not _primary_writer():
        return
    save_checkpoint(g_out, state)
    from gridnext_tpu.io import unified_cache_path
    from gridnext_tpu.io.unify import read_unified_genes

    genes = read_unified_genes(unified_cache_path(args.spaceranger[0],
                                                  hd_binning))
    with open(os.path.join(args.out, "model.json"), "w") as fh:
        json.dump({"classes": classes, "patch_px": args.patch_px,
                   "window_px": args.window_px,
                   "patch_chunk": args.patch_chunk,
                   "count_chunk": count_chunk,
                   "n_genes": len(genes), "genes": genes,
                   "log1p": args.count_f != "scbert",
                   "count_f": args.count_f,
                   "scbert_vocab": vocab, "scbert_dim": args.scbert_dim,
                   "scbert_depth": args.scbert_depth,
                   "scbert_heads": args.scbert_heads,
                   "scbert_dim_head": args.scbert_dim_head,
                   "scbert_features": args.scbert_features,
                   "hd_binning": hd_binning,
                   "grid_dims": ([mm_grids.image_dataset.h_st,
                                  mm_grids.image_dataset.w_st] if square
                                 else None),
                   "image_f": args.f, "tpu_f": tpu_f_meta,
                   "dense_ingest": bool(args.dense_ingest),
                   "model": "GridNetMM" if square else "GridNetHexMM"}, fh)
    print(f"saved model to {args.out}")


def _write_loupe(label_grid, srd, args, classes, hd_binning=None,
                 hex_coords=True, index=None):
    """Shared Loupe-CSV export for every register branch: output naming
    (single file vs per-array directory), positions lookup, write, log.

    ``index`` (the array's position in args.spaceranger) disambiguates
    cohorts whose dirs share a basename — the standard '.../outs' layout —
    which would otherwise silently overwrite each other's CSVs (same
    convention as _evaluate_one's map files)."""
    from gridnext_tpu.evaluate import to_loupe_annots
    from gridnext_tpu.io import find_position_file
    from gridnext_tpu.io.unify import array_name

    name = array_name(srd)
    names = [array_name(s) for s in args.spaceranger]
    if index is not None and names.count(name) > 1:
        name = f"{index:02d}_{name}"
    out_csv = (args.out if len(args.spaceranger) == 1
               else os.path.join(args.out, f"{name}_loupe.csv"))
    if len(args.spaceranger) > 1:
        os.makedirs(args.out, exist_ok=True)
    to_loupe_annots(label_grid, find_position_file(srd, hd_binning), out_csv,
                    annot_names=classes, hex_coords=hex_coords)
    print(f"registered {name} -> {out_csv}")


def _cmd_pretrain_scbert(args):
    """Masked-expression pretraining of an scBERT-scale PerformerLM on a
    Visium cohort -- the upstream recipe the reference's scBERT checkpoint
    assumes (TencentAILab scBERT; the reference ships no pretraining code,
    llm/scbert.py:79 only consumes the checkpoint). No annotations needed.

    The output checkpoint feeds the fine-tuning flow directly:
    ``train-mm --count-f scbert --scbert-ckpt <out>/scbert_lm.msgpack``
    (matching --scbert-vocab/dim/depth/heads) loads every LM weight and
    re-initializes only the classifier head."""
    import numpy as np

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.models import PerformerLM
    from gridnext_tpu.train import (mlm_token_len, save_checkpoint,
                                     train_mlm)

    # spot-level count dataset (labels unused; cohorts need no annotations)
    spots = create_visium_dataset(args.spaceranger, spatial=False,
                                  use_count=True, use_image=False,
                                  minimum_detection_rate=_min_detection(args),
                                  hd_binning=args.hd_binning)
    transform, vocab = _scbert_count_transform(args.spaceranger,
                                               args.hd_binning,
                                               args.scbert_vocab)
    # MLM batches go sequence-parallel on a 'seq' mesh axis (--mesh
    # data=2,seq=4 splits the 16,906-token FAVOR tensors across chips)
    mesh_shape = _checked_mesh_shape(args, mlm_batch=args.batch_size)
    dls = _split_dls(spots, 5, stream=False, seed=args.split_seed,
                     val_arrays=args.val_arrays)

    def tokens_of(pair):
        """(N, vocab+1) clean int tokens: gene2vec reindex + depth-norm +
        log2(1+x) (preprocess_scbert), clip-bin to [0, bin_num], and append
        the zero token scBERT appends at fine-tune time
        (llm/scbert.py:117-120)."""
        if pair is None:
            return None
        # int16: full-scale corpora are (N_spots, 16907) resident in RAM --
        # half the int32 footprint; bins are tiny and -1 pad rows still fit
        binned = np.minimum(transform(pair[0]),
                            args.bin_num).astype(np.int16)
        return np.concatenate(
            [binned, np.zeros((len(binned), 1), np.int16)], axis=1)

    token_dls = {k: tokens_of(v) for k, v in dls.items()}
    del dls, spots   # the raw float cohort dwarfs the int16 corpus; free it
    n_val = 0 if token_dls.get("val") is None else len(token_dls["val"])
    print(f"MLM corpus: {len(token_dls['train'])} train / {n_val} val spots "
          f"x {vocab} gene2vec tokens, bins 0..{args.bin_num}"
          + (f" [mesh {mesh_shape}]" if mesh_shape else ""))

    # params are seq-len independent (pos_emb 'none'), so this LM loads into
    # scBERT at any n_genes; generalized (ReLU) FAVOR features halve the
    # transcendental cost on TPU (docs/roadmap.md) and are parameterless, so
    # the checkpoint serves either kernel at fine-tune time
    # max_seq_len covers the seq-axis padding train_mlm applies when the
    # mesh's 'seq' size does not divide vocab+1 (real vocabs rarely do:
    # 16,907 = 11*29*53); params stay length-independent (pos_emb 'none')
    lm = PerformerLM(num_tokens=args.bin_num + 2,
                     max_seq_len=mlm_token_len(vocab + 1,
                                               mesh_shape=mesh_shape),
                     dim=args.scbert_dim, depth=args.scbert_depth,
                     heads=args.scbert_heads,
                     dim_head=args.scbert_dim_head,
                     nb_features=args.scbert_features, remat=args.remat,
                     generalized_attention=not args.softmax_features)
    os.makedirs(args.out, exist_ok=True)
    outfile = os.path.join(args.out, "scbert_lm.msgpack")
    state, val_hist, train_hist = train_mlm(
        lm, token_dls, mask_id=args.bin_num + 1, mask_prob=args.mask_prob,
        learning_rate=args.lr, num_epochs=args.epochs,
        batch_size=args.batch_size, outfile=outfile,
        shuffle_seed=args.split_seed, redraw_every=args.redraw_every or None,
        mesh_shape=mesh_shape, resume=_resume_path(args, outfile))
    if not _primary_writer():
        return
    save_checkpoint(outfile, state, include_opt_state=False)
    with open(os.path.join(args.out, "pretrain.json"), "w") as fh:
        json.dump({"model": "PerformerLM-MLM", "vocab": vocab,
                   "dim": args.scbert_dim, "depth": args.scbert_depth,
                   "heads": args.scbert_heads,
                   "dim_head": args.scbert_dim_head,
                   "nb_features": args.scbert_features,
                   "bin_num": args.bin_num,
                   "mask_prob": args.mask_prob,
                   # the checkpoint holds the BEST-val params; describe those
                   "val_loss": (float(min(val_hist)) if val_hist else None)},
                  fh)
    print(f"saved pretrained LM to {outfile}")


def _distill_count_mm(args, meta, classes, tvars):
    """`distill` on a multimodal dir with an scBERT count-f: distill the
    count classifier into a stateless CountMLP student reading raw log1p
    counts (cross-representation -- the teacher reads gene2vec-binned
    tokens of the SAME spots), carry the image f + corrector verbatim, and
    write a standard MM model dir (count_f='mlp'). The count side is the
    zoo's slowest serving path (~105 spots/s scBERT vs multi-M MLP on
    v5e, docs/roadmap.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.models import CountMLP
    from gridnext_tpu.train import (distill_patch_classifier, label_agreement,
                                    write_count_distilled_mm_dir)

    for srd in args.spaceranger:
        _validated_count_cache(srd, meta)
    grid_dims = meta.get("grid_dims")
    spots = create_visium_dataset(
        args.spaceranger, spatial=False, use_count=True, use_image=False,
        hd_binning=meta.get("hd_binning"),
        grid_dims=tuple(grid_dims) if grid_dims else None,
        minimum_detection_rate=None)
    raw, _ = spots.materialize()
    rng = np.random.default_rng(args.split_seed)
    if len(raw) > args.max_patches:
        # cap the resident pool like the image path: the gene2vec token
        # view is (N, 16907) f32 -- ~4 GB at a 12-array full-vocab cohort.
        # Stays f32: transform() emits CONTINUOUS depth-normalized
        # log2(1+x) values that scBERT floors into bins internally, so a
        # bf16 pool would flip ~0.4% of bins vs the f32 serving path and
        # the recorded agreement would describe a teacher nobody serves.
        pick = np.sort(rng.choice(len(raw), size=args.max_patches,
                                  replace=False))
        print(f"sampling {args.max_patches} of {len(raw)} spots "
              "(--max-patches)")
        raw = raw[pick]
    transform, _ = _scbert_count_transform(args.spaceranger,
                                           meta.get("hd_binning"),
                                           meta["scbert_vocab"])
    t_pool = transform(raw)
    s_pool = np.log1p(raw)

    mm = _mm_model_from_meta(meta, classes)
    scbert_mod = mm.count_classifier
    from gridnext_tpu.modeldir import submodule_variables

    f_vars = submodule_variables(tvars, "count_classifier")

    def teacher_apply(x):
        return scbert_mod.apply(f_vars, x, train=False)

    def teacher_logits_chunked(x, chunk=512):
        # full-vocab scBERT activations at 9k-sequence holdouts exceed
        # HBM in one apply; evaluate in bounded batches
        outs = [np.asarray(teacher_apply(jnp.asarray(x[i:i + chunk])))
                for i in range(0, len(x), chunk)]
        return np.concatenate(outs)

    order = rng.permutation(len(raw))
    n_hold = max(1, int(len(raw) * args.holdout))
    hold_idx, train_idx = order[:n_hold], order[n_hold:]
    if not len(train_idx):
        sys.exit("error: no training spots left after the holdout split")
    print(f"distilling scBERT count-f -> CountMLP on {len(train_idx)} "
          f"spots ({n_hold} held out), {args.steps} steps x batch "
          f"{args.batch_size}")
    student = CountMLP(n_classes=len(classes), batch_norm=False)
    svars, losses = distill_patch_classifier(
        teacher_apply, student, s_pool[train_idx],
        teacher_inputs=t_pool[train_idx], steps=args.steps,
        batch_size=min(args.batch_size, len(train_idx)),
        learning_rate=args.lr, temperature=args.temperature,
        kl_weight=args.kl_weight, verbose=True)

    t_lab = np.argmax(teacher_logits_chunked(t_pool[hold_idx]), -1)
    s_lab = np.asarray(jnp.argmax(
        student.apply(svars, jnp.asarray(s_pool[hold_idx]),
                      train=False), -1))
    agr_f = float((t_lab == s_lab).mean())
    print(f"holdout count-f agreement (argmax): {agr_f:.4f}")
    info = {"count_f_agreement": agr_f, "steps": args.steps,
            "final_loss": losses[-1]}
    write_count_distilled_mm_dir(args.out, meta, classes, tvars, svars, info)

    if args.images is not None:
        # full-MM label agreement over the provided arrays: both models'
        # forward on the same grids, each with ITS OWN count preprocessing
        _require_one_image_per_dir(args.images, args.spaceranger)
        s_meta, s_classes, s_vars = _load_model_dir(args.out)
        mm_student = _mm_model_from_meta(s_meta, s_classes)
        grids = create_visium_dataset(
            args.spaceranger, spatial=True, use_count=True, use_image=True,
            fullres_image_files=args.images,
            patch_size_px=meta.get("patch_px", 128),
            window_size_px=meta.get("window_px"),
            hd_binning=meta.get("hd_binning"),
            grid_dims=tuple(grid_dims) if grid_dims else None,
            minimum_detection_rate=None)
        agrs = []
        for i in range(len(args.spaceranger)):
            (xi, xc), _ = grids[i]
            fg = xc.sum(-1) > 0
            lt = np.asarray(jnp.argmax(mm.apply(
                tvars, (xi[None], transform(xc)[None]), train=False)[0],
                -1)) + 1
            ls = np.asarray(jnp.argmax(mm_student.apply(
                s_vars, (xi[None], np.log1p(xc)[None]), train=False)[0],
                -1)) + 1
            agrs.append(label_agreement(np.where(fg, lt, 0),
                                        np.where(fg, ls, 0)))
        agr_label = float(np.mean(agrs))
        print(f"full-MM label agreement (teacher vs student): "
              f"{agr_label:.4f} over {len(agrs)} arrays")
        info["label_agreement"] = agr_label
        write_count_distilled_mm_dir(args.out, meta, classes, tvars, svars,
                                     info)
    if (args.min_agreement is not None
            and info.get("label_agreement",
                         info["count_f_agreement"]) < args.min_agreement):
        sys.exit(f"error: agreement below --min-agreement "
                 f"{args.min_agreement}: {info}")
    print(f"distilled multimodal model dir written to {args.out} "
          "(count_f=mlp, image f + corrector carried verbatim)")


def _cmd_distill(args):
    """Distill a trained image model's spot classifier into the TPU-shaped
    student (train.distill): the teacher's correction network is carried
    VERBATIM, so the output model dir serves reference-checkpoint semantics
    through register/evaluate/export/serve at TpuPatchClassifier speed
    (~10x the DenseNet-121 path, docs/roadmap.md). Reports the measured
    holdout patch agreement AND full-slide label agreement -- parity is
    measured, never assumed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.modeldir import image_f_from_meta
    from gridnext_tpu.models import TpuPatchClassifier
    from gridnext_tpu.train import (distill_patch_classifier, label_agreement,
                                    patch_agreement,
                                    write_distilled_model_dir)

    meta, classes, tvars = _load_model_dir(args.model)
    if meta.get("model") in ("GridNetHexMM", "GridNetMM"):
        if meta.get("count_f") != "scbert":
            sys.exit("error: this multimodal dir's count-f is already an "
                     "MLP; distillation targets scBERT count classifiers "
                     "(count_f='scbert') or image models")
        return _distill_count_mm(args, meta, classes, tvars)
    try:
        teacher_f, teacher_f_vars = image_f_from_meta(meta, classes, tvars)
    except ValueError as e:
        sys.exit(f"error: {e}")
    if args.images is not None:
        _require_one_image_per_dir(args.images, args.spaceranger)

    patch_px = meta.get("patch_px", 128)
    ds = create_visium_dataset(
        args.spaceranger, use_count=False, use_image=True, spatial=False,
        fullres_image_files=args.images, patch_size_px=patch_px,
        window_size_px=meta.get("window_px"),
        hd_binning=meta.get("hd_binning"),
        grid_dims=meta.get("grid_dims"))
    rng = np.random.default_rng(args.split_seed)
    if len(ds) > args.max_patches:
        # cap the resident pool: a full cohort of 128px f32 patches is
        # ~3.6 GB/array; distillation needs a representative sample, not
        # every patch. Uniform without replacement across all arrays.
        pick = np.sort(rng.choice(len(ds), size=args.max_patches,
                                  replace=False))
        print(f"sampling {args.max_patches} of {len(ds)} patches "
              "(--max-patches)")
        patches = np.stack([ds[int(i)][0] for i in pick])
    else:
        patches, _ = ds.materialize()
    order = rng.permutation(len(patches))
    n_hold = max(1, int(len(patches) * args.holdout))
    hold, train = patches[order[:n_hold]], patches[order[n_hold:]]
    if not len(train):
        sys.exit("error: no training patches left after the holdout split")
    print(f"distilling {meta.get('model')} -> TpuPatchClassifier on "
          f"{len(train)} patches ({n_hold} held out) @ {patch_px}px, "
          f"{args.steps} steps x batch {args.batch_size}")

    def teacher_apply(p):
        return teacher_f.apply(teacher_f_vars, p, train=False)

    arch = {}
    if args.student_stages:
        try:
            arch["stages"] = tuple(
                (int(w), int(d)) for w, d in
                (part.split(":") for part in args.student_stages.split(",")))
        except ValueError:
            sys.exit("error: --student-stages must look like '256:2,512:2' "
                     "(width:depth pairs)")
    if args.student_stem:
        arch["stem_patch"] = args.student_stem
    student = TpuPatchClassifier(
        n_classes=len(classes),
        dtype=None if args.f32 else jnp.bfloat16, **arch)
    svars, losses = distill_patch_classifier(
        teacher_apply, student, train, steps=args.steps,
        batch_size=min(args.batch_size, len(train)),
        learning_rate=args.lr, temperature=args.temperature,
        kl_weight=args.kl_weight, verbose=True)

    def student_apply(p):
        return student.apply(svars, p, train=False)

    agr_patch = patch_agreement(teacher_apply, student_apply, hold)
    print(f"holdout patch agreement (f argmax): {agr_patch:.4f}")

    info = {"patch_agreement": agr_patch, "steps": args.steps,
            "final_loss": losses[-1]}
    out_meta = write_distilled_model_dir(args.out, meta, classes, tvars,
                                         svars, student, info)

    # full-slide label agreement: the end-to-end parity metric (teacher
    # registrar vs the student model dir just written), per array
    if args.images is not None:
        from PIL import Image

        from gridnext_tpu.io import read_positions

        reg_t = _image_registrar_from_meta(meta, classes, tvars)
        s_meta, s_classes, s_vars = _load_model_dir(args.out)
        reg_s = _image_registrar_from_meta(s_meta, s_classes, s_vars)
        agrs = []
        for srd, im in zip(args.spaceranger, args.images):
            wsi = jnp.asarray(np.asarray(Image.open(im)))
            pos = read_positions(srd, meta.get("hd_binning"))
            agrs.append(label_agreement(reg_t(wsi, pos), reg_s(wsi, pos)))
        agr_label = float(np.mean(agrs))
        print(f"full-slide label agreement (teacher g vs student g): "
              f"{agr_label:.4f} over {len(agrs)} arrays")
        info["label_agreement"] = agr_label
        out_meta = write_distilled_model_dir(args.out, meta, classes, tvars,
                                             svars, student, info)
    if (args.min_agreement is not None
            and info.get("label_agreement",
                         info["patch_agreement"]) < args.min_agreement):
        sys.exit(f"error: agreement below --min-agreement "
                 f"{args.min_agreement}: {info}")
    print(f"distilled model dir written to {args.out} "
          f"(model {out_meta['model']})")


def _cmd_export(args):
    """Serialize a trained model's registration pipeline to a portable
    StableHLO artifact (weights embedded; reload with
    serving.load_exported_registration -- no model code needed).

    Image models export the full slide->labels pipeline (requires
    --wsi-shape); count and multimodal models export the grid->labels
    forward (shapes come from model.json)."""
    from gridnext_tpu import geometry
    from gridnext_tpu.serving import export_grid_forward

    meta, classes, variables = _load_model_dir(args.model)
    model_name = meta.get("model", "")
    grid_dims = meta.get("grid_dims")
    h_st, w_st = (tuple(grid_dims) if grid_dims
                  else (geometry.VISIUM_H_ST, geometry.VISIUM_W_ST))
    sidecar = {"classes": classes, "h_st": int(h_st), "w_st": int(w_st),
               "platforms": args.platforms, "model": model_name}

    if model_name.endswith(("DenseNet121", "TpuPatchClassifier")):
        if args.wsi_shape is None:
            sys.exit("error: image-model export needs --wsi-shape H W")
        registrar = _image_registrar_from_meta(meta, classes, variables)
        h, w = args.wsi_shape
        sidecar.update(wsi_shape=[int(h), int(w), 3],
                       window_px=registrar.window_size,
                       hex_coords=registrar.hex_coords,
                       hd_binning=meta.get("hd_binning"))
        if args.dense:
            # dense-tiling artifact (HD): needs a representative slide's
            # positions to fit the lattice extent; exact pitch only (the
            # fractional-pitch banded resample stays a live-registrar path)
            if not args.spaceranger:
                sys.exit("error: export --dense needs --spaceranger SRD (a "
                         "representative array to fit the bin lattice)")
            from gridnext_tpu.io import read_positions
            from gridnext_tpu.serving import fit_dense_lattice

            pos = read_positions(args.spaceranger[0],
                                 meta.get("hd_binning"))
            plan = fit_dense_lattice(pos, registrar.h_st, registrar.w_st,
                                     registrar.window_size,
                                     (int(h), int(w), 3))
            if plan is None or plan[0] != "exact":
                sys.exit("error: --dense needs an exact integer-pitch "
                         "lattice within --wsi-shape; fractional-pitch HD "
                         "lattices use the banded resample (a live-"
                         "registrar path) -- use `register`, or export the "
                         "per-spot artifact with a large-enough --n-spots")
            _, _, _, _, ey, ex = plan
            blob = registrar.export_dense((int(h), int(w), 3), ey, ex,
                                          platforms=args.platforms)
            sidecar.update(kind="dense", extent=[int(ey), int(ex)],
                           inputs="(wsi, oy0, ox0, fg) from an exact "
                                  "serving.fit_dense_lattice plan")
        else:
            blob = registrar.export((int(h), int(w), 3),
                                    n_spots=args.n_spots,
                                    platforms=args.platforms)
            sidecar.update(n_spots=args.n_spots,
                           inputs="(wsi, oy, ox, y_px, x_px); see "
                                  "serving.artifact_spot_inputs")
    elif model_name in ("GridNetHexMM", "GridNetMM"):
        g = _mm_model_from_meta(meta, classes)
        p = meta.get("patch_px", 128)
        scbert = meta.get("count_f") == "scbert"
        n_c = meta["scbert_vocab"] if scbert else meta["n_genes"]
        shapes = ((h_st, w_st, p, p, 3), (h_st, w_st, n_c))
        # scBERT's gene2vec reindex zeroes unmapped genes, so the tissue
        # mask cannot be recovered from the transformed counts -- the
        # artifact takes it explicitly (from RAW counts, like register)
        blob = export_grid_forward(g, variables, shapes,
                                   platforms=args.platforms,
                                   explicit_fg=scbert)
        if scbert:
            inputs = ("(image_grid, count_grid, fg_mask) batched (1, ...); "
                      "counts gene2vec-transformed (preprocess_scbert), "
                      "fg_mask int32 from RAW counts (raw.sum(-1) > 0)")
        elif meta.get("log1p"):
            inputs = ("(image_grid, count_grid) batched (1, ...); "
                      "counts log1p-transformed")
        else:
            inputs = "(image_grid, count_grid) batched (1, ...)"
        sidecar.update(grid_shapes=[list(s) for s in shapes],
                       explicit_fg=scbert, inputs=inputs)
    elif model_name.endswith("CountMLP"):
        from gridnext_tpu.models import CountMLP, GridNet, GridNetHex

        f = CountMLP(n_classes=len(classes))
        g = (GridNet(patch_classifier=f, n_classes=len(classes)) if grid_dims
             else GridNetHex(patch_classifier=f, n_classes=len(classes)))
        shape = (h_st, w_st, meta["n_genes"])
        blob = export_grid_forward(g, variables, shape,
                                   platforms=args.platforms)
        inputs = "(count_grid,) batched (1, H, W, n_genes)"
        if meta.get("log1p"):
            inputs += "; log1p-transformed"
        sidecar.update(grid_shapes=[list(shape)], inputs=inputs)
    else:
        sys.exit(f"error: don't know how to export model {model_name!r}")

    with open(args.out, "wb") as fh:
        fh.write(blob)
    with open(args.out + ".json", "w") as fh:
        json.dump(sidecar, fh, indent=1)
    print(f"wrote {args.out} ({len(blob)/1e6:.1f} MB) + sidecar "
          f"{args.out}.json")


def _cmd_serve_artifact(args):
    """Register slides from an exported StableHLO artifact: decode ->
    fixed-shape spot inputs from the JSON sidecar -> artifact call ->
    Loupe CSV. Never constructs a model -- the deployment-unit serving
    loop (pair of `export`)."""
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.ingest import SlideSource
    from gridnext_tpu.server import load_artifact
    from gridnext_tpu.serving import artifact_spot_inputs

    _require_one_image_per_dir(args.images, args.spaceranger)
    # all artifact/sidecar validation (existence, JSON, n_spots-vs-dense,
    # required fields, deserialization, platform match) lives in
    # server.load_artifact -- ONE copy of the sidecar contract for the
    # batch CLI and the resident server
    try:
        exported, side = load_artifact(args.artifact)
    except (FileNotFoundError, ValueError) as e:
        sys.exit(f"error: {e}")
    dense = side.get("kind") == "dense"
    fn = exported.call
    hexc = side.get("hex_coords", True)
    source = SlideSource(args.images, args.spaceranger,
                         hd_binning=side.get("hd_binning"))
    for i, wsi, pos in source:
        if list(wsi.shape) != list(side["wsi_shape"]):
            sys.exit(f"error: slide {args.images[i]} is {tuple(wsi.shape)} "
                     f"but the artifact was exported for "
                     f"{tuple(side['wsi_shape'])} (shapes are static; "
                     "re-export with --wsi-shape)")
        if dense:
            from gridnext_tpu.serving import fit_dense_lattice

            plan = fit_dense_lattice(pos, side["h_st"], side["w_st"],
                                     side["window_px"],
                                     tuple(side["wsi_shape"]))
            if plan is None or plan[0] != "exact":
                sys.exit(f"error: {args.spaceranger[i]} is not an exact "
                         "integer-pitch lattice; this dense artifact can't "
                         "serve it (use `register`)")
            _, oy0, ox0, fg, ey, ex = plan
            if [int(ey), int(ex)] != list(side["extent"]):
                sys.exit(f"error: {args.spaceranger[i]} extent ({ey}, {ex}) "
                         f"differs from the artifact's {side['extent']} "
                         "(shapes are static; re-export)")
            labels = np.asarray(fn(wsi, jnp.int32(oy0), jnp.int32(ox0),
                                   jnp.asarray(fg)))
        else:
            ins = artifact_spot_inputs(
                wsi.shape, pos, side["n_spots"],
                window_size=side["window_px"],
                h_st=side["h_st"], w_st=side["w_st"], hex_coords=hexc)
            labels = np.asarray(fn(wsi, *map(jnp.asarray, ins)))
        _write_loupe(labels, args.spaceranger[i], args, side["classes"],
                     hd_binning=side.get("hd_binning"), hex_coords=hexc,
                     index=i)


def _cmd_serve(args):
    """Resident registration server: load the model (or artifact) once,
    compile once, then register slides per HTTP request (server.py --
    the third serving shape next to batch `register` and the
    `export`/`serve-artifact` deployment units)."""
    from gridnext_tpu.server import RegistrationService, make_server

    try:
        if args.artifact:
            if getattr(args, "mesh", None):
                sys.exit("error: --mesh applies to --model serving; "
                         "artifacts serialize the single-device path "
                         "(re-export is not mesh-aware)")
            service = RegistrationService.from_artifact(args.artifact)
        else:
            mesh = None
            if getattr(args, "mesh", None):
                from gridnext_tpu.train.loops import _resolve_mesh

                mesh = _resolve_mesh(None, _parse_mesh(args))
                print(f"serving over mesh "
                      f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
            service = RegistrationService.from_model_dir(
                args.model, mesh=mesh, max_batch=args.max_batch)
    except (ValueError, FileNotFoundError) as e:
        sys.exit(f"error: {e}")

    if args.warmup:
        # absorb the first-request XLA compile before listening
        if service.needs_image and len(args.warmup) != 2:
            sys.exit("error: --warmup needs IMAGE SPACERANGER for this "
                     "model (it registers slides)")
        if not service.needs_image and len(args.warmup) != 1:
            sys.exit("error: --warmup needs just SPACERANGER for a count "
                     "model")
        image, srd = ((args.warmup[0], args.warmup[1])
                      if service.needs_image else (None, args.warmup[0]))
        import time as _time

        t0 = _time.perf_counter()
        try:
            service.register(srd, image=image)
        except (ValueError, FileNotFoundError) as e:
            sys.exit(f"error: warmup failed: {e}")
        print(f"warmup register: {_time.perf_counter() - t0:.1f}s "
              "(includes compile); subsequent requests skip it")
        # /metrics should describe steady-state serving, not the one-off
        # compile (or the phantom warmup request)
        service.reset_metrics()

    httpd = make_server(service, args.host, args.port, verbose=args.verbose)
    host, port = httpd.server_address[:2]
    info = service.info()
    print(f"serving {info['model']} ({len(service.classes)} classes, "
          f"backend {info['backend']}) on http://{host}:{port} -- "
          "GET /healthz | /metrics, POST /register", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
    finally:
        httpd.server_close()


def _cmd_register(args):
    import jax
    import numpy as np

    from gridnext_tpu.data import CountGridDataset
    from gridnext_tpu.models import CountMLP, GridNetHex

    meta, classes, variables = _load_model_dir(args.model)
    model_name = meta.get("model", "")
    if model_name in ("GridNetHexMM", "GridNetMM"):
        # multimodal registration: count grids + patch grids through g
        _require_one_image_per_dir(args.images, args.spaceranger)
        from gridnext_tpu.data import create_visium_dataset

        # count caches must exist AND carry the training gene axis before
        # the factory touches them (it would otherwise regenerate with a
        # different detection filter and feed f a misaligned gene axis)
        for srd in args.spaceranger:
            _validated_count_cache(srd, meta)

        if meta.get("count_f") == "scbert":
            count_transform, _ = _scbert_count_transform(
                args.spaceranger, meta.get("hd_binning"),
                meta["scbert_vocab"])
        else:
            count_transform = np.log1p if meta.get("log1p") else None
        grid_dims = meta.get("grid_dims")  # square HD (Cartesian corrector)
        g = _mm_model_from_meta(meta, classes)
        if meta.get("dense_ingest") and grid_dims:
            # dense-ingest model: the image modality tiles straight off the
            # decoded slides at register time too (no per-bin patch cache
            # is ever materialized), paired with count grids from the
            # validated unified caches
            from gridnext_tpu.data import DenseWSIGridDataset

            img_ds = DenseWSIGridDataset(
                args.images, args.spaceranger, None,
                patch_size=meta.get("patch_px", 128),
                hd_binning=meta.get("hd_binning"),
                grid_dims=tuple(grid_dims))
            cnt_ds = create_visium_dataset(
                args.spaceranger, spatial=True, use_count=True,
                use_image=False, hd_binning=meta.get("hd_binning"),
                grid_dims=tuple(grid_dims), minimum_detection_rate=None)
            mm_item = lambda i: (img_ds[i][0], cnt_ds[i][0])  # noqa: E731
        else:
            mm = create_visium_dataset(args.spaceranger, spatial=True,
                                       use_count=True, use_image=True,
                                       fullres_image_files=args.images,
                                       patch_size_px=meta.get("patch_px", 128),
                                       window_size_px=meta.get("window_px"),
                                       hd_binning=meta.get("hd_binning"),
                                       grid_dims=(tuple(grid_dims)
                                                  if grid_dims else None),
                                       minimum_detection_rate=None)
            mm_item = lambda i: mm[i][0]  # noqa: E731
        for i, srd in enumerate(args.spaceranger):
            xi, xc = mm_item(i)
            fg = xc.sum(-1) > 0  # tissue mask from RAW counts, pre-transform
            if count_transform is not None:
                xc = count_transform(xc)
            logits = g.apply(variables, (xi[None], xc[None]), train=False)
            labels = np.asarray(jax.numpy.argmax(logits[0], -1)) + 1
            label_grid = np.where(fg, labels, 0)
            _write_loupe(label_grid, srd, args, classes,
                         hd_binning=meta.get("hd_binning"),
                         hex_coords=grid_dims is None, index=i)
        return

    if model_name.endswith(("DenseNet121", "TpuPatchClassifier")):
        # image model: register straight from the fullres slides via the
        # jitted serving path (patch gather + f + fused Pallas corrector)
        _require_one_image_per_dir(args.images, args.spaceranger)
        from gridnext_tpu.serving import SlideRegistrar, register_slides

        from gridnext_tpu.train.loops import _resolve_mesh

        mesh = _resolve_mesh(None, _parse_mesh(args))
        if mesh is not None:
            print(f"serving over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")

        grid_dims = meta.get("grid_dims")  # square HD (direct-coord Loupe)
        registrar = _image_registrar_from_meta(meta, classes, variables,
                                               mesh=mesh)
        # production serving loop: threaded decode + async staging overlap
        # the device dispatches; same-shape slides batch per dispatch
        for i, label_grid, _pos in register_slides(
                registrar, args.images, args.spaceranger,
                hd_binning=meta.get("hd_binning"),
                slide_batch=args.slide_batch):
            _write_loupe(label_grid, args.spaceranger[i], args, classes,
                         hd_binning=meta.get("hd_binning"),
                         hex_coords=grid_dims is None, index=i)
        return

    if model_name == "HexGCN":
        # graph model: each array becomes its own hex graph; node argmax
        # labels scatter back onto the odd-right lattice for Loupe export
        import jax.numpy as jnp

        from gridnext_tpu.data.graph_data import visium_to_graphdata
        from gridnext_tpu.geometry import (VISIUM_H_ST, VISIUM_W_ST,
                                           pseudo_hex_to_oddr)
        from gridnext_tpu.modeldir import (graph_model_from_meta,
                                           validate_graph_feature_axis)

        model = graph_model_from_meta(meta, classes)
        for i, srd in enumerate(args.spaceranger):
            try:
                validate_graph_feature_axis(meta, srd)
            except ValueError as e:
                sys.exit(f"error: {e}")
            gd = visium_to_graphdata([srd])
            x = np.log1p(gd["nodes"]) if meta.get("log1p") else gd["nodes"]
            logits = model.apply(variables, jnp.asarray(x),
                                 jnp.asarray(gd["edges"]))
            labels = np.asarray(jnp.argmax(logits, -1)) + 1
            label_grid = np.zeros((VISIUM_H_ST, VISIUM_W_ST), np.int64)
            ox, oy = pseudo_hex_to_oddr(gd["pos"][:, 0], gd["pos"][:, 1])
            label_grid[oy, ox] = labels
            _write_loupe(label_grid, srd, args, classes, index=i)
        return

    if not model_name.endswith("CountMLP"):
        # an unexpected/missing model.json "model" must not silently fall
        # through to the count path (it would die deep in flax apply);
        # mirror export's explicit refusal
        sys.exit(f"error: don't know how to register model "
                 f"{model_name or '<missing>'!r} (expected GridNet[Hex]"
                 f"[MM]+CountMLP / *DenseNet121 / *TpuPatchClassifier / "
                 f"HexGCN)")
    grid_dims = meta.get("grid_dims")  # square HD lattices (GridNet g)
    f = CountMLP(n_classes=len(classes))
    if grid_dims is not None:
        from gridnext_tpu.models import GridNet

        g = GridNet(patch_classifier=f, n_classes=len(classes))
    else:
        g = GridNetHex(patch_classifier=f, n_classes=len(classes))

    for i, srd in enumerate(args.spaceranger):
        cfile = _validated_count_cache(srd, meta)
        if grid_dims is not None:
            gdat = CountGridDataset([cfile], Visium=False,
                                    h_st=grid_dims[0], w_st=grid_dims[1])
        else:
            gdat = CountGridDataset([cfile])
        x, _ = gdat[0]
        if meta.get("log1p"):
            x = np.log1p(x)
        logits = g.apply(variables, x[None], train=False)
        labels = np.asarray(jax.numpy.argmax(logits[0], -1)) + 1
        label_grid = np.where(x.sum(-1) > 0, labels, 0)
        _write_loupe(label_grid, srd, args, classes,
                     hd_binning=meta.get("hd_binning"),
                     hex_coords=grid_dims is None, index=i)


def _array_names(spaceranger_dirs):
    """Per-array output names for map/CSV files; standard Spaceranger
    layouts often name every dir 'outs', so colliding basenames get an
    index prefix (shared by every evaluate path)."""
    from gridnext_tpu.io.unify import array_name

    names = [array_name(s) for s in spaceranger_dirs]
    if len(set(names)) < len(names):
        names = [f"{i:02d}_{n}" for i, n in enumerate(names)]
    return names


def _evaluate_graph(meta, classes, variables, args):
    """Graph-tier evaluate: the annotated cohort as one hex graph through
    HexGCN, emitting the same (y_true, y_pred, smax, extras) contract as
    the grid models -- including per-array label/softmax grids for
    --maps (node outputs scatter back onto the odd-right lattice)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.data.graph_data import visium_to_graphdata
    from gridnext_tpu.geometry import (VISIUM_H_ST, VISIUM_W_ST,
                                       pseudo_hex_to_oddr)
    from gridnext_tpu.modeldir import (graph_model_from_meta,
                                       validate_graph_feature_axis)

    if args.f_only:
        sys.exit("error: --f-only does not apply to graph models (HexGCN "
                 "has no separate spot classifier f)")
    if getattr(args, "tta", False):
        sys.exit("error: --tta applies to image-patch models only")
    if len(args.annots) != len(args.spaceranger):
        sys.exit("error: need one --annots file per --spaceranger dir")
    for srd in args.spaceranger:
        try:
            validate_graph_feature_axis(meta, srd)
        except ValueError as e:
            sys.exit(f"error: {e}")
    # keep_unannotated: evaluate message passing over the SAME full
    # in-tissue lattice training and serving use; metrics cover the
    # labeled nodes only
    gd = visium_to_graphdata(args.spaceranger, annot_files=args.annots,
                             keep_unannotated=True)
    ds_classes = [str(c) for c in gd["classes"]]
    unseen = [c for c in ds_classes if c not in classes]
    if unseen:
        sys.exit(f"error: annotations contain classes the model never "
                 f"trained on: {unseen} (model classes: {classes})")
    remap = np.asarray([classes.index(c) for c in ds_classes])

    model = graph_model_from_meta(meta, classes)
    x = np.log1p(gd["nodes"]) if meta.get("log1p") else gd["nodes"]
    logits = model.apply(variables, jnp.asarray(x), jnp.asarray(gd["edges"]))
    smax_all = np.asarray(jax.nn.softmax(logits, -1))
    y_enc = np.asarray(gd["y"])
    labeled = y_enc >= 0
    if not labeled.any():
        sys.exit("error: no annotated spots to evaluate")
    y_true = remap[y_enc[labeled]]
    smax = smax_all[labeled]
    y_pred = np.argmax(smax, -1)

    names = _array_names(args.spaceranger)
    grids = []
    if getattr(args, "maps", None):
        off = 0
        for n in gd["n_node"]:
            n = int(n)
            pos = gd["pos"][off:off + n]
            lab = labeled[off:off + n]
            ox, oy = pseudo_hex_to_oddr(pos[:, 0], pos[:, 1])
            tg = np.zeros((VISIUM_H_ST, VISIUM_W_ST), np.int64)
            sg = np.zeros((VISIUM_H_ST, VISIUM_W_ST, len(classes)))
            tg[oy[lab], ox[lab]] = remap[y_enc[off:off + n][lab]] + 1
            sg[oy, ox] = smax_all[off:off + n]
            grids.append((tg, sg))
            off += n
    return ("HexGCN", classes, len(args.spaceranger), y_true, y_pred, smax,
            {"grids": grids, "names": names, "hex": True})


def _evaluate_one(model_dir, args):
    """Foreground predictions of one trained model dir over the annotated
    arrays: (model_name, classes, n_arrays, y_true, y_pred, smax)."""
    import numpy as np

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.evaluate import all_fgd_predictions

    meta, classes, variables = _load_model_dir(model_dir)
    model_name = meta.get("model", "")
    if model_name == "HexGCN":
        return _evaluate_graph(meta, classes, variables, args)
    hd_binning = meta.get("hd_binning")
    grid_dims = meta.get("grid_dims")
    mm = model_name in ("GridNetHexMM", "GridNetMM")
    if mm and args.f_only:
        # MM patch_predictions concat BOTH modalities' f outputs (2C
        # channels, gridnet_models.py:235) -- not a per-class softmax
        sys.exit("error: --f-only is ambiguous for multimodal models "
                 "(patch predictions concatenate both modalities); "
                 "evaluate the single-modality models instead")
    use_image = mm or model_name.endswith(("DenseNet121",
                                           "TpuPatchClassifier"))
    use_count = mm or not use_image
    if len(args.annots) != len(args.spaceranger):
        sys.exit("error: need one --annots file per --spaceranger dir")
    if use_image:
        _require_one_image_per_dir(args.images, args.spaceranger)
    if use_count:
        for srd in args.spaceranger:
            _validated_count_cache(srd, meta)

    transform = None
    if use_count:
        if meta.get("count_f") == "scbert":
            transform, _ = _scbert_count_transform(
                args.spaceranger, hd_binning, meta["scbert_vocab"])
        elif meta.get("log1p"):
            transform = np.log1p

    if meta.get("dense_ingest") and use_image and grid_dims:
        # dense-ingest HD model: tile patch grids off the slides directly
        # (no per-bin cache), labels ride the image grids
        from gridnext_tpu.data import DenseWSIGridDataset
        from gridnext_tpu.data.datasets import MMStackDataset

        ds = DenseWSIGridDataset(args.images, args.spaceranger, args.annots,
                                 patch_size=meta.get("patch_px", 128),
                                 hd_binning=hd_binning,
                                 grid_dims=tuple(grid_dims))
        if mm:
            cnt = create_visium_dataset(
                args.spaceranger, spatial=True, use_count=True,
                use_image=False, annot_files=args.annots,
                hd_binning=hd_binning, grid_dims=tuple(grid_dims),
                minimum_detection_rate=None)
            ds = MMStackDataset(ds, cnt)
    else:
        kw = dict(annot_files=args.annots, hd_binning=hd_binning,
                  grid_dims=tuple(grid_dims) if grid_dims else None,
                  minimum_detection_rate=None)
        if use_image:
            kw.update(fullres_image_files=args.images,
                      patch_size_px=meta.get("patch_px", 128),
                      window_size_px=meta.get("window_px"))
        ds = create_visium_dataset(args.spaceranger, spatial=True,
                                   use_count=use_count, use_image=use_image,
                                   **kw)

    # the eval cohort's label encoding (alphanumeric over ITS annotation
    # union) must be remapped onto the model's training classes
    ds_classes = [] if ds.classes is None else [str(c) for c in ds.classes]
    unseen = [c for c in ds_classes if c not in classes]
    if unseen:
        sys.exit(f"error: annotations contain classes the model never "
                 f"trained on: {unseen} (model classes: {classes})")
    lut = np.zeros(len(ds_classes) + 1, np.int64)
    for i, name in enumerate(ds_classes):
        lut[i + 1] = classes.index(name) + 1

    g = _grid_model_from_meta(meta, classes)
    trues, preds, smaxes, grids = [], [], [], []
    for i in range(len(ds)):
        x, y = ds[i]
        y = lut[np.asarray(y).astype(np.int64)]
        if mm:
            xi, xc = x
            if transform is not None:
                xc = transform(np.asarray(xc))
            x = (np.asarray(xi)[None], np.asarray(xc)[None])
        else:
            x = np.asarray(x)
            if transform is not None:
                x = transform(x)
            x = x[None]
        t, p, s, gr = all_fgd_predictions((x, y[None]), g, variables,
                                          f_only=args.f_only,
                                          return_grids=True,
                                          tta=getattr(args, "tta", False))
        trues.append(t)
        preds.append(p)
        smaxes.append(s)
        if getattr(args, "maps", None):
            grids.extend(gr)
    y_true = np.concatenate(trues)
    y_pred = np.concatenate(preds)
    smax = np.concatenate(smaxes)
    if not len(y_true):
        sys.exit("error: no annotated foreground spots to evaluate")
    return (model_name, classes, len(ds), y_true, y_pred, smax,
            {"grids": grids, "names": _array_names(args.spaceranger),
             "hex": grid_dims is None})


def _fgd_metrics(model_name, classes, n_arrays, y_true, y_pred, smax,
                 f_only=False):
    """Foreground-prediction metrics dict: accuracy, per-class + macro
    AUROC/AUPRC, sklearn report, confusion counts."""
    import numpy as np
    from sklearn.metrics import (average_precision_score,
                                 classification_report, confusion_matrix,
                                 roc_auc_score)

    n_c = len(classes)
    auroc, auprc = {}, {}
    for c in range(n_c):
        pos = y_true == c
        if pos.any() and not pos.all():
            auroc[classes[c]] = float(roc_auc_score(pos, smax[:, c]))
            auprc[classes[c]] = float(average_precision_score(pos,
                                                              smax[:, c]))
        else:                                   # class absent (or alone)
            auroc[classes[c]] = auprc[classes[c]] = None
    present_roc = [v for v in auroc.values() if v is not None]
    present_pr = [v for v in auprc.values() if v is not None]
    return {
        "model": model_name, "classes": list(classes), "f_only": bool(f_only),
        "n_arrays": n_arrays, "n_foreground_spots": int(len(y_true)),
        "accuracy": float((y_true == y_pred).mean()),
        "macro_auroc": (float(np.mean(present_roc)) if present_roc
                        else None),
        "macro_auprc": (float(np.mean(present_pr)) if present_pr else None),
        "auroc_per_class": auroc, "auprc_per_class": auprc,
        "report": classification_report(
            y_true, y_pred, labels=list(range(n_c)), target_names=classes,
            output_dict=True, zero_division=0),
        "confusion": confusion_matrix(
            y_true, y_pred, labels=list(range(n_c))).tolist(),
    }


def _save_eval_maps(maps_dir, names, grids, classes, hex_coords):
    """Per-array figures: true/predicted label maps (hex-aware scatter)
    and the misclassification-density heatmap (plotting.misclass_density,
    the reference's plotting.py:138-149 view)."""
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np
    from matplotlib import pyplot as plt

    from gridnext_tpu.plotting import misclass_density, plot_label_tensor

    os.makedirs(maps_dir, exist_ok=True)
    for name, (true_grid, smax_grid) in zip(names, grids):
        pred_grid = (np.argmax(smax_grid, -1) + 1) * (true_grid > 0)
        for tag, grid in (("true", true_grid), ("pred", pred_grid)):
            fig, ax = plt.subplots(figsize=(10, 8))
            plot_label_tensor(grid, class_names=classes, Visium=hex_coords,
                              ax=ax)
            fig.savefig(os.path.join(maps_dir, f"{name}_{tag}.png"),
                        dpi=120, bbox_inches="tight")
            plt.close(fig)
        fig, ax = plt.subplots(figsize=(10, 8))
        im = ax.imshow(misclass_density(smax_grid, true_grid),
                       cmap="magma", vmin=0.0, vmax=1.0)
        ax.axis("off")
        fig.colorbar(im, ax=ax, shrink=0.8, label="1 - p(true class)")
        fig.savefig(os.path.join(maps_dir, f"{name}_misclass.png"),
                    dpi=120, bbox_inches="tight")
        plt.close(fig)
    print(f"label/misclass maps -> {maps_dir} ({len(names)} arrays x 3)")


def _save_eval_plots(plots_dir, y_true, y_pred, smax, classes, prefix=""):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from gridnext_tpu.plotting import performance_curves, plot_confusion

    os.makedirs(plots_dir, exist_ok=True)
    fig, _, _, _ = performance_curves(y_true, smax, class_names=classes)
    fig.savefig(os.path.join(plots_dir, f"{prefix}curves.png"), dpi=120,
                bbox_inches="tight")
    plt.close(fig)
    fig, _ = plot_confusion(y_true, y_pred, class_names=classes)
    fig.savefig(os.path.join(plots_dir, f"{prefix}confusion.png"), dpi=120,
                bbox_inches="tight")
    plt.close(fig)
    print(f"figures -> {plots_dir}/{prefix}curves.png, {prefix}confusion.png")


def _cmd_evaluate(args):
    """Metrics for trained model(s) over ANNOTATED arrays: foreground
    accuracy, per-class + macro AUROC/AUPRC, precision/recall report, and
    confusion matrix -> JSON (optionally ROC/PR + confusion figures).

    One command for the notebooks' post-hoc evaluation flow
    (all_fgd_predictions -> plotting.py:14-134); works for every model
    family register serves (count / image / MM, hex or square-HD lattices,
    dense-ingest HD models included). With MULTIPLE --model dirs it also
    scores their cross-modality consensus (mean softmax -> argmax), the
    register_pca.ipynb 'consensus(g_pca+g_img)' workflow
    (evaluate.consensus_softmax)."""
    import numpy as np

    per_model = [_evaluate_one(m, args) for m in args.model]
    if len(per_model) == 1:
        model_name, classes, n_arrays, y_true, y_pred, smax, extra \
            = per_model[0]
        metrics = _fgd_metrics(model_name, classes, n_arrays, y_true,
                               y_pred, smax, f_only=args.f_only)
        if args.plots:
            _save_eval_plots(args.plots, y_true, y_pred, smax, classes)
        if args.maps:
            _save_eval_maps(args.maps, extra["names"], extra["grids"],
                            classes, extra["hex"])
    else:
        families = {"graph" if pm[0] == "HexGCN" else "grid"
                    for pm in per_model}
        if len(families) > 1:
            # graph models flatten foreground in positions-file node order,
            # grid models in raster-scan order: same spots, different
            # ordering -- a consensus mean would average softmax rows of
            # DIFFERENT physical spots even when the truth-vector guard
            # below happens to pass by coincidence
            sys.exit("error: consensus cannot mix graph (HexGCN) and grid "
                     "models -- their foreground orderings differ; "
                     "evaluate them separately")
        base = per_model[0]
        for other in per_model[1:]:
            if list(other[1]) != list(base[1]):
                sys.exit(f"error: models disagree on classes: {other[1]} "
                         f"vs {base[1]} -- consensus needs a shared label "
                         "space")
            if not np.array_equal(other[3], base[3]):
                sys.exit("error: models disagree on the foreground truth "
                         "vector; evaluate them over the same arrays and "
                         "annotations")
        classes, y_true = base[1], base[3]
        from gridnext_tpu.evaluate import consensus_softmax

        smax_c = consensus_softmax([pm[5] for pm in per_model])
        pred_c = np.argmax(smax_c, axis=1)
        metrics = {
            "models": {m: _fgd_metrics(pm[0], classes, pm[2], pm[3], pm[4],
                                       pm[5], f_only=args.f_only)
                       for m, pm in zip(args.model, per_model)},
            "consensus": _fgd_metrics(
                "consensus(" + "+".join(pm[0] for pm in per_model) + ")",
                classes, base[2], y_true, pred_c, smax_c,
                f_only=args.f_only),
        }
        if args.plots:
            _save_eval_plots(args.plots, y_true, pred_c, smax_c, classes,
                             prefix="consensus_")
        if args.maps:
            # consensus maps: same true grids, mean softmax across models
            extras = [pm[6] for pm in per_model]
            grids = [(t, np.mean([e["grids"][i][1] for e in extras], axis=0))
                     for i, (t, _) in enumerate(extras[0]["grids"])]
            _save_eval_maps(args.maps, extras[0]["names"], grids, classes,
                            extras[0]["hex"])

    with open(args.out, "w") as fh:
        json.dump(metrics, fh, indent=1)
    for label, m in ([("", metrics)] if len(per_model) == 1 else
                     [(f"[{k}] ", v) for k, v in metrics["models"].items()]
                     + [("[consensus] ", metrics["consensus"])]):
        print(f"{label}{m['n_foreground_spots']} foreground spots over "
              f"{m['n_arrays']} arrays: acc {m['accuracy']:.4f}, "
              f"mAUROC {m['macro_auroc']}, mAUPRC {m['macro_auprc']}")
    print(f"metrics -> {args.out}")


def _add_image_train_args(s):
    s.add_argument("--spaceranger", nargs="+", required=True)
    s.add_argument("--annots", nargs="+", required=True)
    s.add_argument("--images", nargs="+", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--patch-px", type=int, default=128)
    s.add_argument("--window-px", type=int, default=None,
                   help="crop this window around each spot and resize down "
                        "to --patch-px (grid_from_wsi_visium's window_size; "
                        "wider histological context at the same f cost). "
                        "Default: crop exactly --patch-px")
    s.add_argument("--f", choices=("densenet", "tpu"), default="densenet",
                   help="spot classifier: 'densenet' (reference parity, "
                        "DenseNet-121) or 'tpu' (TpuPatchClassifier, ~3.6x "
                        "patch throughput for new training)")
    s.add_argument("--patch-chunk", type=int, default=624)
    s.add_argument("--epochs", type=int, default=10)
    s.add_argument("--batch-size", type=int, default=32)
    s.add_argument("--f-lr", type=float, default=1e-3)
    s.add_argument("--g-lr", type=float, default=1e-3)
    s.add_argument("--finetune-f", action="store_true")
    s.add_argument("--bf16", action="store_true")
    s.add_argument("--augment", action="store_true",
                   help="on-device training augmentation: each patch "
                        "independently draws one of the 8 flips/rotations "
                        "inside the jitted train step (zero host cost; "
                        "pipeline.augment_patches -- the TPU-native "
                        "img_transforms). Applies to image patches only; "
                        "eval and register see clean inputs")


def _add_scbert_geometry_args(s):
    s.add_argument("--scbert-dim-head", type=int, default=64,
                   help="per-head attention width (64 = the reference "
                        "checkpoint shape)")
    s.add_argument("--scbert-features", type=int, default=None,
                   help="FAVOR random features m per head (default: "
                        "dim_head*ln(dim_head) = 266 at dim_head 64, the "
                        "reference checkpoint shape). For NEW models m=64 "
                        "measured +49%% full-scale pretraining throughput "
                        "on v5e -- with generalized (ReLU) features m is a "
                        "capacity knob, not an approximation bound "
                        "(docs/roadmap.md). Must match between "
                        "pretrain-scbert and train-mm for checkpoint "
                        "transfer (the FAVOR projection shape depends on it)")


def _add_mesh_args(s):
    s.add_argument("--mesh", default=None,
                   help="multi-chip device mesh: 'auto' (data x spot over "
                        "all visible devices) or axis sizes like "
                        "'data=4,spot=2'; params replicate, batches shard, "
                        "XLA inserts the collectives")
    s.add_argument("--grid-batch-size", type=int, default=1,
                   help="arrays per gridwise training step (must be "
                        "divisible by the mesh's data axis size)")
    s.add_argument("--split-seed", type=int, default=0,
                   help="seed for the random train/val split")
    s.add_argument("--val-arrays", nargs="+", default=None,
                   help="hold out these whole arrays (dir basenames) for "
                        "validation instead of a random split")
    s.add_argument("--resume", action="store_true",
                   help="continue an interrupted run from the '.latest' "
                        "checkpoints in --out (written every epoch); the "
                        "continuation reproduces an uninterrupted run "
                        "bit-for-bit (--epochs is the TOTAL epoch count)")


def _add_hd_args(s, corrector: str):
    s.add_argument("--hd-binning", default=None,
                   help="Visium HD binned output to read (e.g. square_008um)")
    s.add_argument("--grid-dims", default=None,
                   help="square HD bin lattice: 'auto' (infer from positions) "
                        f"or HxW; selects the Cartesian {corrector} corrector")


def build_parser():
    """The full gridnext_tpu argument parser (one subparser per command).

    Exposed separately from :func:`main` so tooling and tests can inspect
    the command surface (e.g. tests/test_readme.py validates every CLI
    line in the README against it) without dispatching anything.
    """
    ap = argparse.ArgumentParser(prog="gridnext_tpu", description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--profile-dir", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the whole command "
                         "into DIR (view with TensorBoard/xprof); goes "
                         "BEFORE the subcommand: gridnext_tpu --profile-dir "
                         "/tmp/tb train-count ...")
    ap.add_argument("--multihost", action="store_true",
                    help="join a multi-controller cluster before running the "
                         "command (run the SAME command on every pod host); "
                         "auto-discovers on Cloud TPU pods. Goes BEFORE the "
                         "subcommand, like --profile-dir")
    ap.add_argument("--coordinator", default=None, metavar="SPEC",
                    help="hand-wired --multihost cluster: "
                         "'coordinator_host:port,num_processes,process_id' "
                         "(implies --multihost)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("simulate", help="fabricate pseudo-Visium data")
    s.add_argument("--out", required=True)
    s.add_argument("--arrays", type=int, default=4)
    s.add_argument("--genes", type=int, default=60)
    s.add_argument("--classes", type=int, default=4)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--image", action="store_true")
    s.add_argument("--gene2vec-names", action="store_true",
                   help="name the simulated genes from the vendored "
                        "gene2vec vocabulary (so the cohort feeds the "
                        "scBERT commands)")
    s.add_argument("--barcodes", choices=("synthetic", "visium_v1"),
                   default="synthetic",
                   help="'visium_v1' stamps the REAL vendored slide "
                        "whitelist onto the lattice (Loupe CSVs re-import "
                        "against actual barcodes); default: self-"
                        "describing SYN names")
    s.add_argument("--hd-grid", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="emit square-lattice Visium HD binned outputs on an "
                        "HxW bin grid instead of the 78x64 Visium lattice")
    s.add_argument("--hd-binning", default="square_008um",
                   help="binning name for --hd-grid output layout")
    s.set_defaults(fn=_cmd_simulate)

    s = sub.add_parser("prepare", help="generate unified counts / patch caches")
    s.add_argument("--spaceranger", nargs="+", required=True)
    s.add_argument("--images", nargs="*", default=None)
    s.add_argument("--patch-px", type=int, default=128)
    s.add_argument("--window-px", type=int, default=None,
                   help="crop window side; resized down to --patch-px "
                        "(cache dirs get a _w{px} suffix)")
    s.add_argument("--min-detection", type=float, default=None,
                   help="gene detection-rate filter (default 0.02)")
    s.add_argument("--hd-binning", default=None,
                   help="Visium HD binned output to read (e.g. square_008um)")
    s.set_defaults(fn=_cmd_prepare)

    s = sub.add_parser("train-count", help="train CountMLP f + GridNetHex g")
    _add_hd_args(s, "GridNet")
    s.add_argument("--spaceranger", nargs="+", required=True)
    s.add_argument("--annots", nargs="+", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--epochs", type=int, default=10)
    s.add_argument("--batch-size", type=int, default=128)
    s.add_argument("--f-lr", type=float, default=1e-4)
    s.add_argument("--g-lr", type=float, default=1e-3)
    s.add_argument("--finetune-f", action="store_true")
    s.add_argument("--min-detection", type=float, default=None,
                   help="gene detection-rate filter (default 0.02)")
    _add_mesh_args(s)
    s.set_defaults(fn=_cmd_train_count)

    s = sub.add_parser("train-graph",
                       help="train the HexGCN node classifier over the "
                            "cohort hex graph")
    s.add_argument("--spaceranger", nargs="+", required=True)
    s.add_argument("--annots", nargs="+", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--steps", type=int, default=200,
                   help="full-batch optimizer updates over the cohort graph")
    s.add_argument("--lr", type=float, default=5e-3)
    s.add_argument("--hidden", type=int, default=64,
                   help="graph-conv hidden width")
    s.add_argument("--depth", type=int, default=3,
                   help="message-passing layers")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=_cmd_train_graph)

    s = sub.add_parser("train-image", help="train DenseNet-121 f + GridNetHex g")
    _add_image_train_args(s)
    s.add_argument("--no-stream", action="store_true",
                   help="materialize the cohort in RAM instead of streaming "
                        "batches off disk")
    s.add_argument("--dense-ingest", action="store_true",
                   help="square-HD only: tile training grids straight from "
                        "the fullres slides (bins tile the image, so no "
                        "per-bin JPEG patch cache is written -- ~147k "
                        "files/slide saved at capture-area scale); skips "
                        "the spotwise stage and trains f jointly with g")
    _add_hd_args(s, "GridNet")
    _add_mesh_args(s)
    s.set_defaults(fn=_cmd_train_image)

    s = sub.add_parser("train-mm",
                       help="train multimodal GridNetHexMM (count + image)")
    _add_image_train_args(s)
    s.add_argument("--min-detection", type=float, default=None,
                   help="gene detection-rate filter (default 0.02)")
    s.add_argument("--count-f", choices=("mlp", "scbert"), default="mlp",
                   help="count classifier: 'mlp' (CountMLP, tutorial parity) "
                        "or 'scbert' (the multimodal_model_test.py stack: "
                        "counts reindexed into the gene2vec space, Performer "
                        "over the token sequence; trains from random init -- "
                        "convert a pretrained torch checkpoint via "
                        "compat.scbert_convert to start from weights)")
    s.add_argument("--scbert-vocab", type=int, default=16906,
                   help="gene2vec tokens to use (full vocabulary = 16,906; "
                        "truncate for small runs)")
    s.add_argument("--scbert-dim", type=int, default=200)
    s.add_argument("--scbert-depth", type=int, default=6)
    s.add_argument("--scbert-heads", type=int, default=10)
    _add_scbert_geometry_args(s)
    s.add_argument("--scbert-ckpt", default=None,
                   help="start the scBERT count-f from a pretrained "
                        "checkpoint: a torch .pth (converted on the fly) or "
                        "a flax msgpack; mismatched entries (classifier "
                        "head, truncated vocab) re-initialize")
    s.add_argument("--scbert-finetune", action="store_true",
                   help="freeze all but the final norm, last-but-one "
                        "performer layer, and head (the reference's "
                        "fine-tune policy, llm/scbert.py:124-132)")
    s.add_argument("--count-chunk", type=int, default=None,
                   help="spots per count-f chunk in g (default: patch-chunk "
                        "for mlp, 8 for scbert)")
    s.add_argument("--no-stream", action="store_true",
                   help="materialize the cohort in RAM instead of streaming "
                        "batches off disk")
    s.add_argument("--dense-ingest", action="store_true",
                   help="square-HD only: tile the image modality's training "
                        "grids straight from the fullres slides (no per-bin "
                        "JPEG patch cache); skips the image-f spotwise "
                        "stage and trains the image f jointly with g")
    _add_hd_args(s, "GridNetMM")
    _add_mesh_args(s)
    s.set_defaults(fn=_cmd_train_mm)

    s = sub.add_parser(
        "pretrain-scbert",
        help="masked-expression (MLM) pretraining of an scBERT-scale "
             "PerformerLM on a Visium cohort (no annotations needed); "
             "feed the checkpoint to train-mm --count-f scbert "
             "--scbert-ckpt")
    s.add_argument("--spaceranger", nargs="+", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--epochs", type=int, default=10)
    s.add_argument("--batch-size", type=int, default=4,
                   help="sequences per step (full-scale scBERT is "
                        "compute-bound: batch 4-8 is the measured sweet "
                        "spot on v5e, docs/roadmap.md)")
    s.add_argument("--lr", type=float, default=1e-4)
    s.add_argument("--mask-prob", type=float, default=0.15)
    s.add_argument("--bin-num", type=int, default=5,
                   help="expression bins (tokens 0..bin_num; mask id "
                        "bin_num+1; vocabulary bin_num+2)")
    s.add_argument("--min-detection", type=float, default=None,
                   help="gene detection-rate filter (default 0.02)")
    s.add_argument("--hd-binning", default=None,
                   help="Visium HD binned output to read (e.g. square_008um)")
    s.add_argument("--scbert-vocab", type=int, default=16906,
                   help="gene2vec tokens (full vocabulary = 16,906; "
                        "truncate for small runs)")
    s.add_argument("--scbert-dim", type=int, default=200,
                   help="model width. 200 matches the reference checkpoint "
                        "shape; for NEW pretraining width is nearly free on "
                        "TPU (step time measured flat 200..384, "
                        "docs/roadmap.md) -- prefer 256 with --scbert-heads 8")
    s.add_argument("--scbert-depth", type=int, default=6)
    s.add_argument("--scbert-heads", type=int, default=10)
    _add_scbert_geometry_args(s)
    s.add_argument("--remat", action="store_true",
                   help="rematerialize performer layers (required for "
                        "full-scale pretraining in 16 GB HBM)")
    s.add_argument("--softmax-features", action="store_true",
                   help="exact-softmax FAVOR features instead of the "
                        "default generalized (ReLU) features (~2x slower "
                        "at full scale; parameterless either way, so the "
                        "checkpoint is kernel-agnostic)")
    s.add_argument("--redraw-every", type=int, default=1000,
                   help="FAVOR+ projection redraw interval in steps "
                        "(0 disables; llm/performer_pytorch.py:532-546)")
    s.add_argument("--mesh", default=None,
                   help="multi-chip device mesh: 'auto' or axis sizes like "
                        "'data=8' (pure DP) or 'data=2,seq=4' "
                        "(sequence-parallel: the gene-token axis and its "
                        "FAVOR feature tensors -- the per-chip memory hog "
                        "at full scBERT scale -- shard over 'seq'; batch "
                        "size need only divide 'data'); params replicate, "
                        "XLA inserts the collectives")
    s.add_argument("--split-seed", type=int, default=0,
                   help="seed for the random train/val split")
    s.add_argument("--val-arrays", nargs="+", default=None,
                   help="hold out these whole arrays (dir basenames) for "
                        "validation instead of a random split")
    s.add_argument("--resume", action="store_true",
                   help="continue an interrupted run from the '.latest' "
                        "checkpoint in --out (--epochs is the TOTAL count)")
    s.set_defaults(fn=_cmd_pretrain_scbert)

    s = sub.add_parser(
        "distill",
        help="distill a trained image model's f into the TPU-shaped "
             "student (g carried verbatim) for fast checkpoint-parity "
             "serving; agreement is measured and recorded in model.json")
    s.add_argument("--model", required=True,
                   help="teacher: a trained IMAGE model dir (DenseNet-121 "
                        "or TpuPatchClassifier f)")
    s.add_argument("--spaceranger", nargs="+", required=True,
                   help="arrays supplying the distillation patch pool")
    s.add_argument("--images", nargs="+", default=None,
                   help="fullres slides (omit if patch caches exist; "
                        "required for the full-slide agreement report)")
    s.add_argument("--out", required=True, help="student model dir")
    s.add_argument("--steps", type=int, default=2000)
    s.add_argument("--batch-size", type=int, default=256)
    s.add_argument("--lr", type=float, default=3e-4)
    s.add_argument("--temperature", type=float, default=2.0)
    s.add_argument("--kl-weight", type=float, default=0.1)
    s.add_argument("--holdout", type=float, default=0.15,
                   help="patch fraction held out for the agreement report")
    s.add_argument("--max-patches", type=int, default=20000,
                   help="cap on the resident distillation pool (uniformly "
                        "sampled across arrays). The pool lives in device "
                        "HBM during distillation: 20k 128px f32 patches "
                        "are ~3.9 GB of a v5e's 16 GB; count pools are "
                        "(N, 16907) f32 in the gene2vec view")
    s.add_argument("--split-seed", type=int, default=0)
    s.add_argument("--f32", action="store_true",
                   help="float32 student (default: bfloat16 compute, the "
                        "served configuration)")
    s.add_argument("--student-stages", default=None,
                   help="student architecture as width:depth pairs, e.g. "
                        "'256:2,512:2' (default: the class's measured "
                        "fast config)")
    s.add_argument("--student-stem", type=int, default=None,
                   help="student patchify-stem size (default 16; use 8 "
                        "for patches under 32px)")
    s.add_argument("--min-agreement", type=float, default=None,
                   help="fail (exit nonzero) if measured agreement is "
                        "below this bound")
    s.set_defaults(fn=_cmd_distill)

    s = sub.add_parser("register", help="write Loupe CSVs from a trained model")
    s.add_argument("--spaceranger", nargs="+", required=True)
    s.add_argument("--model", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--images", nargs="*", default=None,
                   help="fullres slide images (required for image models)")
    s.add_argument("--slide-batch", type=int, default=4,
                   help="image models: same-shape slides registered per "
                        "device dispatch, with decode/stage/register "
                        "overlapped (serving.register_slides)")
    s.add_argument("--mesh", default=None,
                   help="image models: serve over a device mesh ('auto' or "
                        "axis sizes like 'data=4,spot=2'); the spot axis "
                        "shards over every mesh axis, features all-gather "
                        "over ICI, labels identical to single-device")
    s.set_defaults(fn=_cmd_register)

    s = sub.add_parser(
        "evaluate",
        help="metrics (acc / AUROC / AUPRC / confusion) for a trained "
             "model over annotated arrays")
    s.add_argument("--spaceranger", nargs="+", required=True)
    s.add_argument("--annots", nargs="+", required=True,
                   help="Loupe annotation CSVs, one per array (the ground "
                        "truth)")
    s.add_argument("--model", nargs="+", required=True,
                   help="trained model dir(s); several dirs also score "
                        "their cross-modality consensus (mean softmax, the "
                        "register_pca.ipynb workflow)")
    s.add_argument("--out", required=True, help="metrics JSON path")
    s.add_argument("--images", nargs="*", default=None,
                   help="fullres slide images (required for image/MM "
                        "models)")
    s.add_argument("--plots", default=None, metavar="DIR",
                   help="also render ROC/PR curve grid + confusion heatmap "
                        "PNGs into DIR")
    s.add_argument("--maps", default=None, metavar="DIR",
                   help="also render per-array true/predicted label maps "
                        "and misclassification-density heatmaps into DIR "
                        "(consensus maps when several models are given)")
    s.add_argument("--f-only", action="store_true",
                   help="evaluate the spot classifier f alone "
                        "(patch_predictions) instead of the corrected grid "
                        "-- the reference's f_only flag (utils.py:33-36)")
    s.add_argument("--tta", action="store_true",
                   help="dihedral test-time augmentation: average softmax "
                        "over all 8 flip/rotation orientations of each "
                        "patch (image/MM models; 8x compute per array)")
    s.set_defaults(fn=_cmd_evaluate)

    s = sub.add_parser(
        "export",
        help="serialize a trained image model's registration pipeline to a "
             "portable StableHLO artifact (jax.export; weights embedded, "
             "reload with serving.load_exported_registration)")
    s.add_argument("--model", required=True, help="trained model directory")
    s.add_argument("--out", required=True, help="output artifact path")
    s.add_argument("--wsi-shape", nargs=2, type=int, default=None,
                   metavar=("H", "W"),
                   help="image models: fullres slide pixel dims the "
                        "artifact is specialized to (shapes are static "
                        "under XLA); count/MM models export the "
                        "grid->labels forward and don't need it")
    s.add_argument("--n-spots", type=int, default=8192,
                   help="fixed spot-axis length; pad real spot arrays with "
                        "SlideRegistrar.spot_inputs (HD bin lattices run "
                        "~147k in-tissue bins -- raise this, or prefer "
                        "--dense)")
    s.add_argument("--dense", action="store_true",
                   help="square-HD image models: export the dense-tiling "
                        "registration (register_dense) instead of the "
                        "per-spot gather; needs --spaceranger and an exact "
                        "integer-pitch lattice")
    s.add_argument("--spaceranger", nargs="*", default=None,
                   help="--dense: representative array dir(s) to fit the "
                        "bin lattice extent from")
    s.add_argument("--platforms", nargs="*", default=None,
                   help="target platforms (e.g. tpu cpu); pallas-path "
                        "registrars export for the current backend only; "
                        "default = current backend")
    s.set_defaults(fn=_cmd_export)

    s = sub.add_parser(
        "serve-artifact",
        help="register slides from an exported StableHLO artifact (no "
             "model code; pair of `export`)")
    s.add_argument("--artifact", required=True,
                   help="artifact path (its .json sidecar must sit beside)")
    s.add_argument("--spaceranger", nargs="+", required=True)
    s.add_argument("--images", nargs="+", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=_cmd_serve_artifact)

    s = sub.add_parser(
        "serve",
        help="resident HTTP registration server: model loaded + compiled "
             "once, slides registered per request (JSON; see server.py)")
    src = s.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="trained model directory (image, "
                                     "count, or multimodal)")
    src.add_argument("--artifact",
                     help="exported StableHLO artifact (+ .json sidecar); "
                          "serves with no model code constructed")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000,
                   help="0 picks a free port (printed at startup)")
    s.add_argument("--mesh", default=None,
                   help="image models: serve over a device mesh ('auto' or "
                        "axis sizes like 'data=4,spot=2')")
    s.add_argument("--warmup", nargs="+", default=None,
                   metavar="PATH",
                   help="register one sample before listening, absorbing "
                        "the XLA compile: IMAGE SPACERANGER for image/MM "
                        "models, SPACERANGER for count models")
    s.add_argument("--max-batch", type=int, default=8,
                   help="image models: concurrent requests that queue while "
                        "a dispatch runs micro-batch into ONE device "
                        "dispatch of up to this many same-shape slides "
                        "(continuous batching; 1 disables)")
    s.add_argument("--verbose", action="store_true",
                   help="log every HTTP request")
    s.set_defaults(fn=_cmd_serve)
    return ap


def _init_multihost(spec):
    """--multihost: join the jax.distributed cluster before any backend use.

    ``spec`` None relies on Cloud TPU pod discovery; --coordinator's
    hand-wired form is 'host:port,num_processes,process_id' (the
    CPU-cluster tests use it).
    """
    from gridnext_tpu.parallel import initialize_multihost

    if spec is None:
        idx = initialize_multihost()
    else:
        try:
            coord, num, pid = spec.rsplit(",", 2)
            idx = initialize_multihost(coordinator_address=coord,
                                       num_processes=int(num),
                                       process_id=int(pid))
        except ValueError:
            sys.exit("error: --coordinator must be "
                     "'host:port,num_processes,process_id'; got "
                     f"{spec!r}")
    import jax

    print(f"multihost: process {idx}/{jax.process_count()}, "
          f"{len(jax.local_devices())} local / {len(jax.devices())} global "
          "devices", file=sys.stderr)


# The trainer subcommands, by handler-name prefix. They are (a) the only
# multihost-aware commands (writers gated to the primary process; everything
# else would race on identical output paths under a pod launch, ADVICE r3)
# and (b) the commands that install the SIGTERM preemption handler -- both
# gates in main() key off this one constant.
_MULTIHOST_CMDS = ("_cmd_train", "_cmd_pretrain")


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.multihost or args.coordinator:
        if not args.fn.__name__.startswith(_MULTIHOST_CMDS):
            sys.exit(
                f"error: --multihost/--coordinator is only supported for "
                "the training subcommands (train-count, train-image, "
                "train-mm, pretrain-scbert), whose writers are gated to "
                "the primary process; run "
                f"'{args.fn.__name__.removeprefix('_cmd_').replace('_', '-')}'"
                " single-controller (it uses every local device via --mesh)")
        _init_multihost(args.coordinator)
    if args.fn.__name__.startswith(_MULTIHOST_CMDS):
        # SIGTERM (spot/queued TPU preemption) -> batch-boundary '.latest'
        # checkpoint -> exit 75 (EX_TEMPFAIL: "transient, retry me"); rerun
        # the same command with --resume to continue bit-identically
        from gridnext_tpu.train import TrainingPreempted, install_preemption_handler
        from gridnext_tpu.train.preempt import uninstall_preemption_handler

        install_preemption_handler()
        try:
            _dispatch(args)
        except TrainingPreempted as e:
            print(f"preempted: {e}", file=sys.stderr)
            if e.checkpoint is not None:
                print("resume by rerunning with --resume", file=sys.stderr)
            raise SystemExit(75)
        finally:
            # restore signal dispositions for in-process callers (pytest,
            # notebooks): a leftover flag-setting handler that nobody polls
            # would swallow real SIGTERMs after the command returns
            uninstall_preemption_handler()
    else:
        _dispatch(args)


def _dispatch(args):
    if args.profile_dir:
        from gridnext_tpu.observability import profile_trace

        with profile_trace(args.profile_dir):
            args.fn(args)
        print(f"profiler trace written to {args.profile_dir} "
              "(tensorboard --logdir it, Profile tab)")
    else:
        args.fn(args)


if __name__ == "__main__":
    main()
