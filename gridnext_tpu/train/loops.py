"""Training loops: jitted optax steps with reference-parity semantics.

Re-design of the reference's torch epoch loops (training.py:11-209):

* ``train_spotwise`` -- spot classifier f, plain CE over (B, n_classes).
* ``train_gridwise`` -- grid corrector g (optionally fine-tuning f through a
  second learning rate): outputs (B, H, W, C) are flattened, background
  (label 0) is masked out, foreground labels are shifted to [0, N)
  (training.py:152-157 mask-and-shift semantics preserved exactly), loss is
  the mean CE over foreground spots.
* best-validation-loss snapshotting of params (+opt state), restored before
  return (training.py:79-97,184-208) -- the snapshot lives in host RAM and is
  optionally serialized to ``outfile`` via flax.serialization.
* gradient accumulation via ``optax.MultiSteps`` (the ``accum_iters`` analog).
* separate f/g optimizers as one ``optax.multi_transform`` keyed on the
  top-level param collection name -- f params are frozen unless ``f_lr`` is
  given, matching the tutorials (Tutorial_visium_count.ipynb cell 22 freezes
  f; register_concat fine-tunes it with its own Adam).

Everything inside the step is fixed-shape: background masking is a
``where``-mask reduction, never boolean indexing, so one XLA program serves
every array. Metrics come back as a small device scalar dict per step and
are reduced on host.
"""

from __future__ import annotations

import os
import time
from typing import Any, Mapping, Optional

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gridnext_tpu.train import preempt


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # other variable collections (e.g. the Performer 'favor' projections)
    extra_vars: Any = flax.struct.field(default_factory=dict)

    def variables(self):
        v = {"params": self.params, **(self.extra_vars or {})}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


# f-network param collections inside GridNet* modules (models/gridnet.py)
_F_KEYS = ("patch_classifier", "image_classifier", "count_classifier")


def _param_labels(params):
    # optax.multi_transform wants a label tree congruent with params: label
    # every leaf under an f-network collection "f", everything else "g".
    return {
        k: jax.tree.map(lambda _: "f" if k in _F_KEYS else "g", v)
        for k, v in params.items()
    }


def make_gridwise_optimizer(lr: float = 1e-3, f_lr: Optional[float] = None,
                            accum_iters: int = 1,
                            frozen_f_labels=None) -> optax.GradientTransformation:
    """g-optimizer (+optional f fine-tune optimizer) with grad accumulation.

    ``frozen_f_labels``: optional {f_collection_key: label_fn} carrying a
    per-f-subtree freeze policy into the joint stage — label_fn maps that
    collection's param subtree to a 'train'/'frozen' label tree (e.g.
    ``models.scbert.finetune_param_labels``); 'frozen' leaves stay at
    set_to_zero even when ``f_lr`` is given, so a spotwise-stage freeze
    (pretrained scBERT) is not silently dropped when f trains jointly
    with g.
    """
    f_tx = optax.adam(f_lr) if f_lr is not None else optax.set_to_zero()
    frozen = frozen_f_labels or {}

    def labels(params):
        out = {}
        for k, v in params.items():
            if k in frozen:
                inner = frozen[k](v)  # 'train'/'frozen' tree congruent w/ v
                out[k] = jax.tree.map(
                    lambda lbl: "f" if lbl == "train" else "frozen", inner)
            else:
                out[k] = jax.tree.map(
                    lambda _: "f" if k in _F_KEYS else "g", v)
        return out

    tx = optax.multi_transform(
        {"g": optax.adam(lr), "f": f_tx, "frozen": optax.set_to_zero()},
        labels if frozen else _param_labels)
    if accum_iters > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_iters)
    return tx


def create_train_state(model: nn.Module, rng, sample_input, tx,
                       train_init: bool = False) -> TrainState:
    variables = model.init(rng, sample_input, train=train_init)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    extra = {k: v for k, v in variables.items()
             if k not in ("params", "batch_stats")}
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32),
                      extra_vars=extra)


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray):
    """Foreground-masked CE.

    Args:
      logits: (..., C) raw scores.
      labels: (...,) integer labels with 0 = background, 1..C = foreground.

    Returns:
      (loss, n_correct, n_foreground): mean CE over foreground, plus
      accuracy numerator/denominator.
    """
    logits = logits.reshape(-1, logits.shape[-1])
    labels = labels.reshape(-1)
    mask = labels > 0
    fg_labels = jnp.maximum(labels - 1, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, fg_labels)
    n_fg = jnp.sum(mask)
    loss = jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.maximum(n_fg, 1)
    preds = jnp.argmax(logits, axis=-1)
    n_correct = jnp.sum(jnp.where(mask, preds == fg_labels, False))
    return loss, n_correct, n_fg


def _spot_loss(logits, labels):
    """Plain CE; labels < 0 mark padding rows (mesh batch padding) and are
    excluded from loss and accuracy. Unpadded batches reduce identically to
    an unmasked mean."""
    mask = labels >= 0
    safe_labels = jnp.maximum(labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe_labels)
    n = jnp.sum(mask)
    loss = jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.maximum(n, 1)
    n_correct = jnp.sum(jnp.where(mask, jnp.argmax(logits, -1) == safe_labels,
                                  False))
    return loss, n_correct, n


def _spot_mse(preds, targets):
    """Regression objective for self-supervised spot heads (e.g. predicting
    count PCs from image patches, the counts_from_img.ipynb workflow).
    Non-finite target rows mark padding (mesh batch padding)."""
    row_valid = jnp.isfinite(targets).all(
        axis=tuple(range(1, targets.ndim))) if targets.ndim > 1 \
        else jnp.isfinite(targets)
    safe_t = jnp.where(jnp.isfinite(targets), targets, 0.0)
    per_row = jnp.mean((preds - safe_t) ** 2,
                       axis=tuple(range(1, preds.ndim)))
    n = jnp.sum(row_valid)
    mse = jnp.sum(jnp.where(row_valid, per_row, 0.0)) / jnp.maximum(n, 1)
    return mse, jnp.zeros((), jnp.int32), n


def make_steps(model: nn.Module, tx, loss_kind: str, augment=None):
    """Build jitted (train_step, eval_step) closures for a model + optimizer.

    ``loss_kind``: 'grid' (foreground-masked CE over (B, H, W, C) grids),
    'spot' (plain CE), or 'spot_mse' (regression). The returned steps are
    sharding-transparent: pass them replicated state and mesh-sharded batches
    (``gridnext_tpu.parallel.shard_grid_batch`` / ``shard_spot_batch``) and
    the XLA SPMD partitioner inserts the collectives -- the same closures
    serve single-chip and multi-chip execution. This is the public step
    factory behind ``train_spotwise(mesh=...)`` / ``train_gridwise(mesh=...)``.

    ``augment``: optional jit-safe ``fn(key, x) -> x`` applied to the batch
    inside the TRAIN step only (eval sees clean inputs), keyed on the step
    index so resumed runs replay the identical augmentation stream --
    ``pipeline.augment_patches`` is the image-patch implementation (the
    TPU-native take on the reference tutorials' torchvision
    ``img_transforms`` augmentation).
    """

    loss_fn = {"grid": masked_cross_entropy, "spot": _spot_loss,
               "spot_mse": _spot_mse}[loss_kind]

    _dropout_base = jax.random.key(11)
    _augment_base = jax.random.key(19)

    def forward(params, batch_stats, extra, x, train, mutable, rngs=None):
        variables = {"params": params, **(extra or {})}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if mutable:
            return model.apply(variables, x, train=train,
                               mutable=["batch_stats"], rngs=rngs)
        return model.apply(variables, x, train=train, rngs=rngs), {}

    @jax.jit
    def train_step(state: TrainState, x, y):
        # per-step dropout rng (unused rngs are ignored by flax)
        rngs = {"dropout": jax.random.fold_in(_dropout_base, state.step)}
        if augment is not None:
            x = augment(jax.random.fold_in(_augment_base, state.step), x)

        def compute(params):
            logits, mut = forward(params, state.batch_stats, state.extra_vars,
                                  x, True, state.batch_stats is not None,
                                  rngs=rngs)
            loss, n_corr, n = loss_fn(logits, y)
            return loss, (n_corr, n, mut)

        (loss, (n_corr, n, mut)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_bs = mut.get("batch_stats", state.batch_stats)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  batch_stats=new_bs, step=state.step + 1)
        return new_state, {"loss": loss, "n_correct": n_corr, "n": n}

    @jax.jit
    def eval_step(state: TrainState, x, y):
        logits, _ = forward(state.params, state.batch_stats, state.extra_vars,
                            x, False, False)
        loss, n_corr, n = loss_fn(logits, y)
        return {"loss": loss, "n_correct": n_corr, "n": n}

    return train_step, eval_step


# Backwards-compatible private alias (pre-public-API name).
_make_steps = make_steps


def make_mlm_steps(model: nn.Module, tx, *, mask_id: int,
                   mask_prob: float = 0.15):
    """Jitted (train_step, eval_step) for masked-LM pretraining.

    The objective the reference's scBERT checkpoint was trained with
    upstream (TencentAILab scBERT; the reference repo ships no pretraining
    code -- llm/scbert.py only consumes the checkpoint): corrupt a random
    ``mask_prob`` subset of each row's integer tokens to ``mask_id`` and
    train the LM to predict the clean token at the corrupted positions.

    Batches are (x, y) like every other step in this module, but only ``y``
    carries data: the clean (B, n) int tokens, with -1 marking batch-padding
    rows (``_pad_batch`` 'spot' semantics). Corruption happens ON DEVICE
    inside the step, keyed on ``state.step`` -- one traced program serves
    every batch, the host stays out of the loop, and the mesh path needs no
    host-side RNG coordination (the folded key is replicated; every shard
    computes the same mask for its rows). Eval corrupts with a FIXED key so
    validation losses are comparable across epochs.

    Sharding-transparent like ``make_steps``: replicated state +
    ``shard_spot_batch``-placed batches turn these closures into DP
    pretraining (the public path behind ``train_mlm(mesh=...)``).
    """
    _mlm_base = jax.random.key(13)
    _mlm_eval_key = jax.random.key(17)
    _dropout_base = jax.random.key(11)

    def forward(params, batch_stats, extra, tokens, train, rngs=None):
        variables = {"params": params, **(extra or {})}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, tokens, train=train, rngs=rngs)

    def mlm_loss(logits, y, mask):
        valid = mask & (y >= 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(y, 0))
        n = jnp.sum(valid)
        loss = jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(n, 1)
        n_correct = jnp.sum(
            jnp.where(valid, jnp.argmax(logits, -1) == y, False))
        return loss, n_correct, n

    def corrupt(key, y):
        mask = jax.random.bernoulli(key, mask_prob, y.shape)
        # pad rows (y == -1) would index the embedding out of range; clamp
        # (their logits are discarded -- `valid` is False there)
        return jnp.where(mask, mask_id, jnp.maximum(y, 0)), mask

    @jax.jit
    def train_step(state: TrainState, x, y):
        del x  # tokens travel in y (clean targets); see docstring
        tokens, mask = corrupt(jax.random.fold_in(_mlm_base, state.step), y)
        rngs = {"dropout": jax.random.fold_in(_dropout_base, state.step)}

        def compute(params):
            logits = forward(params, state.batch_stats, state.extra_vars,
                             tokens, True, rngs=rngs)
            loss, n_corr, n = mlm_loss(logits, y, mask)
            return loss, (n_corr, n)

        (loss, (n_corr, n)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, {"loss": loss, "n_correct": n_corr, "n": n}

    @jax.jit
    def eval_step(state: TrainState, x, y):
        del x
        tokens, mask = corrupt(_mlm_eval_key, y)
        logits = forward(state.params, state.batch_stats, state.extra_vars,
                         tokens, False)
        loss, n_corr, n = mlm_loss(logits, y, mask)
        return {"loss": loss, "n_correct": n_corr, "n": n}

    return train_step, eval_step


def _is_dataset(data) -> bool:
    """Map-style dataset (yields (x, y) per index) vs (inputs, labels) pair."""
    return hasattr(data, "__getitem__") and not isinstance(
        data, (tuple, list)) and not hasattr(data, "ndim")


def _sample_input(data):
    """A leading-1 sample batch for model init, from either loader form.

    Datasets exposing ``sample_item()`` (shape-correct zeros; the image
    grids' hook decodes ONE patch instead of the ~3k a full ``__getitem__``
    costs) are sampled through it -- including streaming Subset views,
    whose transform is applied to the sample like a real item's.
    """
    if _is_dataset(data):
        if hasattr(data, "sample_item"):
            x0 = data.sample_item()
        elif hasattr(data, "dataset") and hasattr(data.dataset,
                                                  "sample_item"):
            x0 = data.dataset.sample_item()
            if getattr(data, "transform", None) is not None:
                x0 = data.transform(x0)
        else:
            x0 = data[0][0]
        if isinstance(x0, (tuple, list)):
            return tuple(jnp.asarray(a)[None] for a in x0)
        return jnp.asarray(x0)[None]
    inputs = data[0]
    if isinstance(inputs, (tuple, list)):
        return tuple(jnp.asarray(a[:1]) for a in inputs)
    return jnp.asarray(inputs[:1])


def _pad_batch(x, y, batch_size: int, loss_kind: str):
    """Pad a partial (x, y) minibatch to ``batch_size`` with ignorable items.

    Inputs repeat the final example (keeps BN statistics in-distribution);
    labels mark padding so the masked losses exclude it: background 0 for
    grid CE, -1 for spot CE, NaN targets for spot MSE. Returns the padded
    batch; callers track the real item count separately.
    """
    # NaN padding needs a float dtype: np.full(..., np.nan, int64) silently
    # fills INT64_MIN, which isfinite() treats as a VALID row and the pad
    # poisons the loss. Regression targets are float math anyway, so cast
    # -- full batches too, keeping one dtype (= one trace) per epoch.
    if loss_kind == "spot_mse" and not np.issubdtype(y.dtype, np.floating):
        y = y.astype(np.float32)
    # the -1 pad marker needs a SIGNED dtype: np.full(-1, uint8) raises on
    # NumPy 2.x and silently wraps to 255 (a "valid" class) on 1.x. Cast
    # full batches too -- one dtype, one trace per epoch.
    if (loss_kind not in ("grid", "spot_mse")
            and np.issubdtype(y.dtype, np.unsignedinteger)):
        y = y.astype(np.int32)
    n_real = len(y)
    n_pad = batch_size - n_real
    if n_pad <= 0:
        return x, y

    def pad_x(a):
        return np.concatenate([a, np.repeat(a[-1:], n_pad, axis=0)])

    x = tuple(pad_x(a) for a in x) if isinstance(x, tuple) else pad_x(x)
    if loss_kind == "spot_mse":
        y = np.concatenate(
            [y, np.full((n_pad,) + y.shape[1:], np.nan, y.dtype)])
    else:
        fill = 0 if loss_kind == "grid" else -1
        y = np.concatenate(
            [y, np.full((n_pad,) + y.shape[1:], fill, y.dtype)])
    return x, y


def _iter_batches(data, batch_size, rng: Optional[np.random.Generator],
                  pad_kind: Optional[str] = None, skip: int = 0):
    """Yield (x, y, n_real) numpy minibatches.

    ``data`` is either an (inputs, labels) array pair -- ``inputs`` a single
    array or a tuple of arrays (multimodal) -- or a map-style dataset whose
    ``__getitem__`` returns (x, y) per item. The dataset form streams: only
    one batch is resident at a time (train-image patch grids are ~1 GB each
    materialized; cf. docs/roadmap.md).

    ``pad_kind`` (a loss kind) pads partial batches to a fixed
    ``batch_size`` with loss-ignorable items -- required under a mesh (the
    batch axis must keep a shardable static shape) and avoids the
    remainder-batch recompile anywhere.

    ``skip`` drops the first ``skip`` batches AFTER drawing the epoch's
    permutation (the RNG stream advances identically), so a mid-epoch
    preemption resume replays exactly the remaining batches."""

    def finish(x, y):
        n_real = len(y)
        if pad_kind is not None:
            x, y = _pad_batch(x, y, batch_size, pad_kind)
        return x, y, n_real

    if _is_dataset(data):
        n = len(data)
        order = rng.permutation(n) if rng is not None else np.arange(n)
        for i in range(skip * batch_size, n, batch_size):
            items = [data[int(j)] for j in order[i:i + batch_size]]
            xs = [it[0] for it in items]
            ys = np.stack([np.asarray(it[1]) for it in items])
            if isinstance(xs[0], (tuple, list)):
                yield finish(tuple(np.stack(z) for z in zip(*xs)), ys)
            else:
                yield finish(np.stack(xs), ys)
        return
    inputs, labels = data
    multi = isinstance(inputs, (tuple, list))
    n = len(labels)
    order = rng.permutation(n) if rng is not None else np.arange(n)
    for i in range(skip * batch_size, n, batch_size):
        idx = order[i:i + batch_size]
        if multi:
            yield finish(tuple(np.asarray(a)[idx] for a in inputs),
                         np.asarray(labels)[idx])
        else:
            yield finish(np.asarray(inputs)[idx], np.asarray(labels)[idx])


# Max dispatched-but-unread steps the epoch loop keeps in flight (see the
# backpressure note in _run_training); also the device staging depth.
_PIPELINE_DEPTH = 2


def _prefetch_to_device(batches, size: int = _PIPELINE_DEPTH, place=None):
    """Stage upcoming (x, y, n_real) minibatches onto the device ahead of use.

    ``jax.device_put`` is asynchronous, so holding ``size`` staged batches
    lets the host's next disk read / np.stack overlap the device's current
    step -- the TPU analog of a DataLoader's worker prefetch. Each batch is
    consumed exactly once, so donation-safe. ``place`` overrides the default
    single-device put (mesh sharding placement).
    """
    import collections

    if place is None:
        place = jax.device_put
    queue = collections.deque()

    def stage():
        try:
            x, y, n_real = next(batches)
        except StopIteration:
            return False
        queue.append(place((x, y)) + (n_real,))
        return True

    for _ in range(size):
        if not stage():
            break
    while queue:
        item = queue.popleft()
        stage()
        yield item


def _resolve_mesh(mesh, mesh_shape):
    """Public trainers accept ``mesh`` (a jax.sharding.Mesh) or ``mesh_shape``
    (e.g. {'data': 4, 'spot': 2}, or 'auto' for the default data x spot
    factorization over all visible devices)."""
    if isinstance(mesh, (str, dict)):
        if mesh_shape is not None:
            # without this the raw string would pass the `mesh is not None`
            # gate below and crash later with exactly the opaque error the
            # slip-acceptance was written to prevent
            raise ValueError("pass mesh= (a jax.sharding.Mesh) OR "
                             f"mesh_shape=, not both (got mesh={mesh!r} "
                             f"and mesh_shape={mesh_shape!r})")
        # mesh='auto' / mesh={'data': 4} is a natural slip for
        # mesh_shape=...; accept it rather than crash later with an opaque
        # "'str' object has no attribute 'axis_names'"
        mesh, mesh_shape = None, mesh
    if mesh is not None:
        return mesh
    if mesh_shape is None:
        return None
    from gridnext_tpu.parallel import make_mesh
    from gridnext_tpu.parallel.mesh import default_mesh_shape

    if isinstance(mesh_shape, str):
        if mesh_shape != "auto":
            raise ValueError(f"mesh_shape must be a dict or 'auto'; got {mesh_shape!r}")
        mesh_shape = default_mesh_shape(len(jax.devices()))
    return make_mesh(mesh_shape)


def _mesh_placement(mesh, loss_kind, batch_size):
    """Batch-placement function for mesh execution. Grid batches shard
    (data x spot); spot batches shard their item axis over every mesh axis;
    MLM token batches on a mesh with a 'seq' axis go sequence-parallel
    (batch over 'data', the gene-token axis over 'seq' -- the FAVOR+
    einsums contract over the sharded axis, so XLA's partitioner psums the
    context/key sums; see parallel/mesh.py docstring). Padding to a fixed
    ``batch_size`` keeps the batch axis shardable; the masked losses ignore
    the pad items, so numerics match unsharded execution."""
    from gridnext_tpu.parallel import (shard_grid_batch, shard_spot_batch,
                                       shard_token_batch)

    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if loss_kind == "grid":
        div = axis_sizes.get("data", 1)
        place = lambda b: shard_grid_batch(b, mesh)  # noqa: E731
    elif loss_kind == "mlm" and "seq" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec

        data = "data" if "data" in mesh.axis_names else None
        div = axis_sizes.get("data", 1)
        dummy_sharding = NamedSharding(mesh, PartitionSpec(data))

        def place(b):
            x, y = b  # x: (B, 1) dummy; y: (B, n_tokens) clean targets
            return (jax.device_put(x, dummy_sharding),
                    shard_token_batch(y, mesh, data_axis=data))
    else:
        div = int(np.prod(mesh.devices.shape))
        place = lambda b: shard_spot_batch(b, mesh)  # noqa: E731
    if batch_size % div:
        raise ValueError(
            f"batch_size {batch_size} is not divisible by the mesh's batch "
            f"sharding factor {div} (mesh axes {axis_sizes}); pick a batch "
            "size divisible by it")
    return place


def _num_items(data) -> int:
    if data is None:
        return 0
    return len(data) if _is_dataset(data) else len(data[1])


def _run_training(model, state, tx, dataloaders, loss_kind, num_epochs,
                  batch_size, outfile, shuffle_seed, verbose,
                  redraw_every: Optional[int] = None, redraw_rng=None,
                  redraw_scaling: int = 0,
                  metrics_logger=None, mesh=None, resume=None, mlm=None,
                  augment=None):
    if loss_kind == "mlm":
        train_step, eval_step = make_mlm_steps(model, tx, **(mlm or {}))
    else:
        train_step, eval_step = make_steps(model, tx, loss_kind,
                                           augment=augment)
    rng = np.random.default_rng(shuffle_seed)
    if redraw_every:
        redraw_rng = redraw_rng if redraw_rng is not None else jax.random.key(7)

    # Resume from a '.latest' checkpoint (written at every epoch end when
    # ``outfile`` is set, and at the interrupted batch on preemption):
    # restores params/opt-state/step, the completed epoch count, the
    # mid-epoch batch position, and the best-val loss, then fast-forwards
    # the shuffle and FAVOR-redraw RNG streams over the completed work --
    # so resume-and-continue reproduces an uninterrupted run's parameter
    # trajectory bit-for-bit (training.py has no resume at all; this is
    # the rebuild's improvement, VERDICT r2 #5 + SURVEY §5.3).
    start_epoch = 0
    start_batch = 0
    redraws_done = 0
    resumed_best = None
    if resume is not None:
        payload = load_checkpoint(resume)
        state = _state_from_payload(payload, state)
        start_epoch = int(payload.get("epochs_done", 0))
        start_batch = int(payload.get("batches_done", 0))
        if start_batch:
            # batches_done is in BATCH units of the preempted run; resuming
            # with a different batch size or shuffle seed would silently
            # skip the wrong samples -- corrupt, not just different
            for key, cur in (("batch_size", batch_size),
                             ("shuffle_seed", shuffle_seed)):
                saved = payload.get(key)
                if saved is not None and saved != cur:
                    raise ValueError(
                        f"mid-epoch resume: the checkpoint was written with "
                        f"{key}={saved} but this run uses {cur}; rerun with "
                        f"the original {key} (batches_done counts batches "
                        "of the preempted run's size)")
        rb = payload.get("best_val_loss")
        if rb is not None and np.isfinite(rb):
            resumed_best = float(rb)
        n_train = _num_items(dataloaders.get("train"))
        for _ in range(start_epoch):
            rng.permutation(max(n_train, 1))  # replay per-epoch shuffles
        if redraw_every:
            # redraws_done is recorded in the checkpoint because the step
            # count alone can't recover it for warm-started states (a run
            # entered at step>0 fires its first redraw at the next
            # redraw_every boundary, not step//redraw_every times in)
            resumed_redraws = payload.get("redraws_done")
            if resumed_redraws is None:  # pre-redraws_done checkpoint
                resumed_redraws = int(state.step) // redraw_every
            redraws_done = int(resumed_redraws)
            for _ in range(redraws_done):
                redraw_rng, _ = jax.random.split(redraw_rng)

    # Partial batches ALWAYS pad to a fixed batch_size with loss-masked
    # items: one execution semantics everywhere, so multi-chip runs (which
    # need a static shardable batch axis) are bit-consistent with
    # single-device runs -- including BatchNorm, whose train-mode statistics
    # see the padded rows either way -- and the remainder batch never
    # triggers a second XLA compile.
    place, pad_kind = None, loss_kind
    if mesh is not None:
        from gridnext_tpu.parallel import replicate

        place = _mesh_placement(mesh, loss_kind, batch_size)
        state = replicate(state, mesh)

    # Multi-controller runs (one process per pod host; parallel/multihost.py)
    # execute this loop identically on every process -- file outputs must
    # come from exactly one of them or same-path writes race on the shared
    # filesystem. Single-process runs are unaffected (process 0 is primary).
    if jax.process_count() > 1:
        from gridnext_tpu.parallel.multihost import is_primary

        if not is_primary():
            outfile = None
            metrics_logger = None
            verbose = False

    # Checkpoint writes happen off-thread (device arrays are immutable, so
    # the background device_get + msgpack write observe the enqueued state
    # exactly) -- the loop never stalls on checkpoint I/O; see async_ckpt.
    ckpt_writer = None
    if outfile is not None:
        from gridnext_tpu.train.async_ckpt import AsyncCheckpointWriter

        ckpt_writer = AsyncCheckpointWriter()

    best_loss = np.inf
    best_params = jax.device_get(state.params)
    best_bs = jax.device_get(state.batch_stats)
    best_extra = jax.device_get(state.extra_vars)
    saw_val = False
    if resumed_best is not None:
        # carry the pre-resume best-val snapshot: the best checkpoint file
        # holds it (written whenever val improved); fall back to the current
        # state if the file is gone
        best_loss = resumed_best
        saw_val = True
        if outfile is not None and os.path.exists(outfile):
            bp = load_checkpoint(outfile)
            best_params = bp["params"]
            best_bs = bp.get("batch_stats")
            best_extra = bp.get("extra_vars") or {}
    host_step = int(state.step)  # one sync up front, then host-tracked
    train_history, val_history = [], []
    since = time.time()

    # Preemption (SIGTERM on spot/queued TPU capacity): poll the
    # process-global guard at every batch boundary; on trigger, write the
    # '.latest' resume checkpoint with the mid-epoch batch position and
    # raise. See train/preempt.py for the full protocol.
    guard = preempt.active()
    n_train_total = -(-_num_items(dataloaders.get("train")) // batch_size)

    def preempt_checkpoint(epoch, batches_done):
        ckpt = None
        if ckpt_writer is not None:
            ckpt = str(outfile) + ".latest"
            ckpt_writer.save(
                ckpt, state,
                extra_meta={"epochs_done": epoch,
                            "batches_done": batches_done,
                            "batch_size": batch_size,
                            "shuffle_seed": shuffle_seed,
                            "redraws_done": redraws_done,
                            "best_val_loss": (float(best_loss)
                                              if np.isfinite(best_loss)
                                              else None)})
        # consume the trigger: it belongs to THIS run. Without the reset a
        # library/notebook user who catches TrainingPreempted and calls
        # train_*(resume=...) in the same process would re-preempt after
        # one batch of every phase, forever (the guard is process-global
        # and only tests ever called reset()).
        if guard is not None:
            guard.reset()
        raise preempt.TrainingPreempted(ckpt)

    try:
        for epoch in range(start_epoch, num_epochs):
            # mid-epoch resume: skip the batches the preempted run already
            # trained (the shuffle permutation is drawn first either way,
            # keeping the RNG stream aligned with an uninterrupted run)
            epoch_skip = start_batch if epoch == start_epoch else 0
            if verbose:
                print(f"Epoch {epoch}/{num_epochs - 1}", flush=True)
                print("-" * 10, flush=True)
            for phase in ("train", "val"):
                if phase not in dataloaders or dataloaders[phase] is None:
                    continue
                # Deferred metric reads: per-batch losses stay on device so the
                # loop never blocks on a host round-trip between steps -- JAX's
                # async dispatch pipelines batch staging (_prefetch_to_device)
                # with device compute. Backpressure: the loss from PIPELINE_DEPTH
                # steps back is fetched each iteration, bounding in-flight steps
                # (and their HBM-resident input batches) instead of letting the
                # host enqueue an unbounded dispatch backlog.
                losses, corrs, ns, bszs = [], [], [], []
                batches = _prefetch_to_device(
                    _iter_batches(dataloaders[phase], batch_size,
                                  rng if phase == "train" else None,
                                  pad_kind=pad_kind,
                                  skip=epoch_skip if phase == "train" else 0),
                    place=place)
                for x, y, n_real in batches:
                    if phase == "train":
                        state, m = train_step(state, x, y)
                        # periodic FAVOR+ projection redraw (Performer models;
                        # llm/performer_pytorch.py:532-546 semantics). host_step
                        # mirrors state.step (one increment per train_step) so
                        # the check doesn't force a device sync.
                        host_step += 1
                        if (redraw_every and state.extra_vars
                                and "favor" in state.extra_vars
                                and host_step % redraw_every == 0):
                            from gridnext_tpu.models.performer import redraw_projections

                            redraw_rng, sub = jax.random.split(redraw_rng)
                            redraws_done += 1
                            new_vars = redraw_projections(
                                {"favor": state.extra_vars["favor"]}, sub,
                                scaling=redraw_scaling)
                            extra = dict(state.extra_vars)
                            extra["favor"] = new_vars["favor"]
                            if mesh is not None:
                                from gridnext_tpu.parallel import replicate

                                extra = replicate(extra, mesh)
                            state = state.replace(extra_vars=extra)
                    else:
                        m = eval_step(state, x, y)
                    losses.append(m["loss"])
                    corrs.append(m["n_correct"])
                    ns.append(m["n"])
                    bszs.append(n_real)
                    lag = len(losses) - 1 - _PIPELINE_DEPTH
                    if lag >= 0:
                        losses[lag] = float(losses[lag])  # sync point: step `lag` done
                        corrs[lag] = int(corrs[lag])
                        ns[lag] = int(ns[lag])
                    if guard is not None and guard.triggered:
                        # train: this epoch's dispatched batches (incl. the
                        # resumed-past prefix); val: the train phase is done
                        preempt_checkpoint(
                            epoch,
                            epoch_skip + len(losses) if phase == "train"
                            else n_train_total)
                losses = np.asarray(jax.device_get(losses), dtype=float)
                corrs = np.asarray(jax.device_get(corrs))
                ns = np.asarray(jax.device_get(ns))
                bszs = np.asarray(bszs)
                n_batches_items = int(bszs.sum())
                if phase == "train" and epoch_skip and not len(losses):
                    # mid-epoch resume past the whole train phase (preempted
                    # during val): nothing trained here, no metric to log
                    continue
                if n_batches_items == 0:
                    # an empty phase (e.g. a split rounding to zero val
                    # items) must not fabricate a 0.0 loss -- a 0.0 "best
                    # val" would pin model selection to the first epoch
                    continue
                epoch_loss = float((losses * bszs).sum()) / max(n_batches_items, 1)
                epoch_acc = int(corrs.sum()) / max(int(ns.sum()), 1)
                if verbose:
                    print(f"{phase} Loss: {epoch_loss:.4f} Acc: {epoch_acc:.4f}", flush=True)
                if metrics_logger is not None:
                    metrics_logger.log(step=int(state.step), epoch=epoch,
                                       phase=phase, loss=epoch_loss, acc=epoch_acc)
                if phase == "val":
                    saw_val = True
                    val_history.append(epoch_loss)
                    if epoch_loss < best_loss:
                        best_loss = epoch_loss
                        best_params = jax.device_get(state.params)
                        best_bs = jax.device_get(state.batch_stats)
                        best_extra = jax.device_get(state.extra_vars)
                        if ckpt_writer is not None:
                            ckpt_writer.save(outfile, state)
                else:
                    train_history.append(epoch_loss)
            if ckpt_writer is not None:
                # resume point: LATEST state at each epoch end (the best-val file
                # above is a serving artifact, not a continuation point)
                ckpt_writer.save(str(outfile) + ".latest", state,
                                 extra_meta={"epochs_done": epoch + 1,
                                             "redraws_done": redraws_done,
                                             "best_val_loss":
                                                 float(best_loss)
                                                 if np.isfinite(best_loss) else None})
    except BaseException:
        # train_step/user exceptions must not strand enqueued checkpoint
        # writes: the best-val file may already hold the state the user
        # wants back. Drain the writer, but never mask the in-flight
        # exception with a checkpoint I/O failure.
        if ckpt_writer is not None:
            try:
                ckpt_writer.close()
            except BaseException as e:
                import sys

                print(f"warning: background checkpoint write failed: {e}",
                      file=sys.stderr)
        raise

    if verbose:
        dt = time.time() - since
        print(f"Training complete in {dt // 60:.0f}m {dt % 60:.0f}s", flush=True)
        if saw_val:
            print(f"Best val loss: {best_loss:4f}", flush=True)

    # restore best-validation weights (training.py:96-97,207-208 semantics);
    # without a val phase there is no "best" -- keep the final params
    if saw_val:
        # restore every collection the best snapshot depends on -- including
        # FAVOR projections, which redraws may have replaced since
        state = state.replace(params=best_params, batch_stats=best_bs,
                              extra_vars=best_extra)
    elif ckpt_writer is not None:
        ckpt_writer.save(outfile, state)
    if ckpt_writer is not None:
        ckpt_writer.close()   # all checkpoints durably on disk before return
    return state, val_history, train_history


def train_spotwise(model: nn.Module, dataloaders: Mapping, *, learning_rate: float = 1e-4,
                   num_epochs: int = 10, batch_size: int = 128, outfile=None,
                   state: Optional[TrainState] = None, tx=None, rng=None,
                   shuffle_seed: int = 0, verbose: bool = True,
                   redraw_every: Optional[int] = None,
                   redraw_scaling: int = 0, loss: str = "ce",
                   metrics_logger=None, mesh=None, mesh_shape=None,
                   resume=None, augment=None):
    """Train a spot classifier f.

    ``dataloaders`` maps 'train'/'val' to (inputs, labels) numpy array pairs
    with integer labels already in [0, n_classes) -- or float targets when
    ``loss='mse'`` (self-supervised regression heads). ``redraw_every``
    enables periodic FAVOR+ projection redraw for Performer-based f (scBERT);
    pass ``redraw_scaling=1`` iff the model was built with ``ortho_scaling=1``
    so redrawn projections match the init distribution.

    Multi-chip: pass ``mesh`` (a jax.sharding.Mesh) or ``mesh_shape`` (e.g.
    {'data': 8}, or 'auto'). Params replicate; each batch's item axis shards
    over every mesh axis (spots are embarrassingly parallel), partial batches
    pad with loss-masked items, and XLA's SPMD partitioner inserts the
    gradient all-reduces. ``batch_size`` must be divisible by the device
    count. Numerics match single-device execution (tests/test_parallel.py).

    Partial batches ALWAYS pad to ``batch_size`` with loss-masked repeats of
    the final item (single- and multi-device alike: one execution semantics,
    no remainder-batch recompile). The loss masks pads exactly; only
    BatchNorm train-mode statistics see the repeated rows on a
    non-divisible epoch's last batch (docs/roadmap.md "Parity edges").

    Resume: pass ``resume=<outfile>.latest`` (written at every epoch end when
    ``outfile`` is set) to continue an interrupted run; ``num_epochs`` is the
    TOTAL epoch count, and the continuation reproduces an uninterrupted run
    bit-for-bit (same seed). The CLI exposes this as ``--resume``.
    """
    mesh = _resolve_mesh(mesh, mesh_shape)
    if tx is None:
        tx = optax.adam(learning_rate)
    if state is None:
        rng = rng if rng is not None else jax.random.key(0)
        sample = _sample_input(dataloaders["train"])
        state = create_train_state(model, rng, sample, tx, train_init=False)
    kind = {"ce": "spot", "mse": "spot_mse"}[loss]
    return _run_training(model, state, tx, dataloaders, kind, num_epochs,
                         batch_size, outfile, shuffle_seed, verbose,
                         redraw_every=redraw_every,
                         redraw_scaling=redraw_scaling,
                         metrics_logger=metrics_logger, mesh=mesh,
                         resume=resume, augment=augment)


def train_gridwise(model: nn.Module, dataloaders: Mapping, *, learning_rate: float = 1e-3,
                   f_lr: Optional[float] = None, accum_iters: int = 1,
                   num_epochs: int = 10, batch_size: int = 1, outfile=None,
                   state: Optional[TrainState] = None, tx=None, rng=None,
                   shuffle_seed: int = 0, verbose: bool = True,
                   metrics_logger=None, mesh=None, mesh_shape=None,
                   resume=None, augment=None):
    """Train a grid model g (GridNet family) with foreground-masked CE.

    ``dataloaders`` maps 'train'/'val' to (inputs, labels) pairs where inputs
    is (N, H, W, ...) -- or a tuple of such arrays for GridNetHexMM -- and
    labels is (N, H, W) with 0 = background, 1..C foreground.

    ``f_lr`` enables joint fine-tuning of the f-network params with their own
    Adam (the reference's ``f_opt``); otherwise f is frozen.

    Multi-chip: pass ``mesh`` (a jax.sharding.Mesh) or ``mesh_shape`` (e.g.
    {'data': 4, 'spot': 2}, or 'auto' for that factorization over all visible
    devices). Params replicate; batches shard array-batch over ``data`` and
    the grid row axis over ``spot`` (the hex corrector's cross-row taps
    become halo ppermutes, inserted by the XLA SPMD partitioner), partial
    batches pad with all-background arrays the masked CE ignores.
    ``batch_size`` must be divisible by the ``data`` axis size. Numerics
    match single-device execution (tests/test_parallel.py).

    Resume: pass ``resume=<outfile>.latest`` (written at every epoch end when
    ``outfile`` is set) to continue an interrupted run; ``num_epochs`` is the
    TOTAL epoch count, and the continuation reproduces an uninterrupted run
    bit-for-bit (same seed). The CLI exposes this as ``--resume``.
    """
    mesh = _resolve_mesh(mesh, mesh_shape)
    if tx is None:
        tx = make_gridwise_optimizer(learning_rate, f_lr, accum_iters)
    if state is None:
        rng = rng if rng is not None else jax.random.key(0)
        sample = _sample_input(dataloaders["train"])
        state = create_train_state(model, rng, sample, tx, train_init=False)
    return _run_training(model, state, tx, dataloaders, "grid", num_epochs,
                         batch_size, outfile, shuffle_seed, verbose,
                         metrics_logger=metrics_logger, mesh=mesh,
                         resume=resume, augment=augment)


def mlm_token_len(n_tokens: int, mesh=None, mesh_shape=None) -> int:
    """The token-axis length ``train_mlm`` will actually run under a mesh.

    Sequence-parallel meshes ('seq' axis) need the token axis divisible by
    the axis size; ``train_mlm`` pads indivisible ARRAY corpora with ``-1``
    columns (ignored by the masked loss; map-style datasets pass through
    unpadded and fall back to token replication with a warning). Size
    length-sensitive model fields (``PerformerLM.max_seq_len``) with this
    so the padded batch passes the model's bounds check.
    """
    mesh = _resolve_mesh(mesh, mesh_shape)
    if mesh is None or "seq" not in mesh.axis_names:
        return int(n_tokens)
    s = mesh.shape["seq"]
    return int(n_tokens) + (-int(n_tokens)) % s


def train_mlm(model: nn.Module, dataloaders: Mapping, *, mask_id: int,
              mask_prob: float = 0.15, learning_rate: float = 1e-4,
              num_epochs: int = 10, batch_size: int = 4, outfile=None,
              state: Optional[TrainState] = None, tx=None, rng=None,
              shuffle_seed: int = 0, verbose: bool = True,
              redraw_every: Optional[int] = None, redraw_scaling: int = 0,
              metrics_logger=None, mesh=None, mesh_shape=None, resume=None):
    """Masked-LM pretraining of a token LM (PerformerLM / headless scBERT).

    The upstream recipe the reference's scBERT checkpoint assumes
    (TencentAILab scBERT masked-expression modeling; the reference ships no
    pretraining code -- llm/scbert.py:79 only consumes the checkpoint).

    ``dataloaders`` maps 'train'/'val' to clean integer token arrays (N, n)
    -- binned expression in [0, bin_num], e.g.
    ``np.minimum(preprocess_scbert(...)[0], bin_num)`` -- with
    ``mask_id = bin_num + 1`` (PerformerLM num_tokens = bin_num + 2,
    llm/scbert.py:98). Each step corrupts a fresh random ``mask_prob``
    subset ON DEVICE (keyed on the step counter) and minimizes CE of the
    clean token at masked positions; accuracy is masked-bin accuracy.

    The resulting checkpoint (``outfile``/``save_checkpoint``) loads
    straight into the fine-tuning flow: the CLI's
    ``train-mm --count-f scbert --scbert-ckpt`` nests a raw-PerformerLM
    tree under scBERT's ``performer_lm`` scope and re-initializes only the
    classifier head (the reference's head-swap protocol,
    llm/scbert.py:110-122).

    Multi-chip: ``mesh``/``mesh_shape`` as in ``train_spotwise`` -- params
    replicate, each batch's row axis shards over every mesh axis, partial
    batches pad with rows the masked loss ignores; numerics match
    single-device execution (tests/test_parallel.py). ``redraw_every``
    periodically redraws FAVOR+ projections (llm/performer_pytorch.py:
    532-546). Resume semantics as in the other trainers.
    """
    mesh = _resolve_mesh(mesh, mesh_shape)
    if tx is None:
        tx = optax.adam(learning_rate)
    seq_n = (mesh.shape.get("seq", 1) if mesh is not None
             and "seq" in mesh.axis_names else 1)

    def as_pair(tokens):
        if tokens is None:
            return None
        # (x, y) pair or a map-style dataset yielding (x, y) -- passthrough
        if isinstance(tokens, tuple) or _is_dataset(tokens):
            return tokens
        tokens = np.asarray(tokens)
        if seq_n > 1 and tokens.shape[1] % seq_n:
            # Sequence-parallel meshes need the token axis divisible by
            # 'seq' or the arrays silently replicate (no FAVOR memory
            # relief). Real vocab sizes rarely divide (16,907 = 11*29*53),
            # so pad with -1 columns: the masked loss ignores y < 0 and the
            # on-device corrupt clamps them to token 0 for the forward --
            # scBERT's own appended-zero convention (llm/scbert.py:117-120).
            # Params are unchanged (pos_emb 'none' is length-independent),
            # so padded-pretrain checkpoints load at any n_genes.
            pad = (-tokens.shape[1]) % seq_n
            if tokens.dtype.kind == "u":
                # -1 pads would wrap to huge valid-looking token ids in an
                # unsigned corpus and silently become real MLM targets
                # (the y >= 0 pad guards never fire); widen to signed
                tokens = tokens.astype(np.int32)
            tokens = np.concatenate(
                [tokens, np.full((len(tokens), pad), -1, tokens.dtype)],
                axis=1)
        # x is a per-row dummy: the tokens travel ONCE as y (the clean
        # targets); the step corrupts on device (make_mlm_steps)
        return np.zeros((len(tokens), 1), np.int8), tokens

    pairs = {k: as_pair(v) for k, v in dataloaders.items()}
    if state is None:
        rng = rng if rng is not None else jax.random.key(0)
        train = pairs["train"]
        # model input is the TOKEN row (y); x is the per-row dummy
        sample = (jnp.asarray(np.asarray(train[0][1]))[None]
                  if _is_dataset(train) else jnp.asarray(train[1][:1]))
        state = create_train_state(model, rng, sample, tx, train_init=False)
    return _run_training(model, state, tx, pairs, "mlm", num_epochs,
                         batch_size, outfile, shuffle_seed, verbose,
                         redraw_every=redraw_every,
                         redraw_scaling=redraw_scaling,
                         metrics_logger=metrics_logger, mesh=mesh,
                         resume=resume,
                         mlm={"mask_id": mask_id, "mask_prob": mask_prob})


def load_f_params(state: TrainState, f_variables: Mapping,
                  key: str = "patch_classifier") -> TrainState:
    """Load pretrained f-network variables into a GridNet train state.

    The tutorial workflow: train f spotwise, then compose it into g
    (Tutorial_visium_count.ipynb cells 13->21). ``f_variables`` is the
    variables dict of the f model (e.g. ``state.variables()`` from
    train_spotwise, or a converted torch checkpoint): 'params',
    'batch_stats', and any extra collections -- a Performer/scBERT f's
    'favor' FAVOR+ projections in particular MUST travel with the params
    (its trained weights were validated against those projections; keeping
    g-init's fresh draw would silently change the f logits inside g).
    """
    params = dict(state.params)
    params[key] = f_variables["params"]
    batch_stats = state.batch_stats
    if f_variables.get("batch_stats") is not None:
        batch_stats = dict(batch_stats or {})
        batch_stats[key] = f_variables["batch_stats"]
    extra = state.extra_vars
    rest = {c: v for c, v in f_variables.items()
            if c not in ("params", "batch_stats") and v is not None}
    if rest:
        extra = dict(extra or {})
        for col, sub in rest.items():
            colmap = dict(extra.get(col) or {})
            colmap[key] = sub
            extra[col] = colmap
    return state.replace(params=params, batch_stats=batch_stats,
                         extra_vars=extra)


# ---------------------------------------------------------------------------
# Checkpointing (flax.serialization; msgpack on disk)
# ---------------------------------------------------------------------------

def save_checkpoint(path, state: TrainState, include_opt_state: bool = True,
                    extra_meta: Optional[Mapping] = None):
    """Serialize a TrainState (params, batch_stats, extra collections, step,
    and -- unlike the reference's weights-only .pth -- the optimizer state,
    enabling true mid-training resume; cf. training.py:184-195 which saves
    opt state in a separate .opt file and has no resume path).
    ``extra_meta``: small scalar metadata merged into the payload (the
    trainers' '.latest' resume checkpoints store epochs_done/best_val_loss).
    """
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "extra_vars": jax.device_get(state.extra_vars),
        "step": int(state.step),
    }
    if include_opt_state:
        payload["opt_state"] = flax.serialization.to_state_dict(
            jax.device_get(state.opt_state))
    if extra_meta:
        payload.update({k: v for k, v in extra_meta.items() if v is not None})
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(flax.serialization.msgpack_serialize(payload))
    os.replace(tmp, path)  # atomic: a killed run never leaves a torn ckpt


def load_checkpoint(path):
    """Read a save_checkpoint payload dict (params/batch_stats/extra_vars/
    step, optionally opt_state) from a msgpack file."""
    with open(path, "rb") as fh:
        return flax.serialization.msgpack_restore(fh.read())


def _state_from_payload(payload, state_template: TrainState) -> TrainState:
    opt_state = state_template.opt_state
    if payload.get("opt_state") is not None:
        opt_state = flax.serialization.from_state_dict(
            state_template.opt_state, payload["opt_state"])
    return state_template.replace(
        params=payload["params"],
        batch_stats=payload.get("batch_stats"),
        extra_vars=payload.get("extra_vars") or {},
        opt_state=opt_state,
        step=jnp.asarray(payload.get("step", 0), jnp.int32))


def restore_train_state(path, state_template: TrainState) -> TrainState:
    """Rebuild a TrainState from a checkpoint, using ``state_template`` (a
    freshly created state for the same model+optimizer) for structure."""
    return _state_from_payload(load_checkpoint(path), state_template)
