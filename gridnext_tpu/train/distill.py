"""Checkpoint-parity FAST serving via f-distillation (VERDICT r3 #2).

The reference's serving model is DenseNet-121 (densenet.py:78) -- an
MXU-hostile shape that caps full-slide registration at ~19k spots/s on a
v5e (architecture-bound: Pallas dense-block kernel, int8, and chunk sweeps
all measured flat, docs/roadmap.md). The TPU-shaped
``TpuPatchClassifier`` serves the identical pipeline at ~190k spots/s.
This module bridges the two: distill a teacher checkpoint's spot
classifier f into the TPU shape, keep the teacher's correction network g
VERBATIM, and serve reference-checkpoint semantics at student speed.

Why f-only distillation preserves the pipeline: GridNetHex's corrector
consumes f's class-logit grid (gridnet_models.py:128-148 -- f_dim ==
n_classes), so a student whose logits match the teacher's logits
reproduces the corrector's inputs, and the full registration (gather -> f
-> g -> argmax) agrees wherever the logit error is below the corrector's
decision margins. The distillation loss therefore targets the LOGITS
(MSE), with an optional temperature-softened KL term for calibrated
boundaries; agreement is then MEASURED end to end (label grids through
both registrars) and reported, never assumed.

Typical flow (the CLI ``distill`` subcommand automates it):

    teacher_apply = lambda p: g_teacher.apply(tvars, p, train=False,
                                              method=..._f_only)
    student = TpuPatchClassifier(n_classes=C, dtype=jnp.bfloat16)
    svars, hist = distill_patch_classifier(teacher_apply, student, patches,
                                           steps=2000, batch_size=256)
    agr = patch_agreement(teacher_apply, student_apply, holdout)
    write_distilled_model_dir(out, teacher_meta, classes, tvars, svars,
                              {"patch_agreement": agr})
"""

from __future__ import annotations

import functools
import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_distill_step(teacher_apply: Callable, student, tx, *,
                      temperature: float = 2.0, kl_weight: float = 0.1,
                      mse_weight: float = 1.0):
    """Jitted distillation step over resident input pools.

    Returns ``step(params, opt_state, pool, t_pool, key, batch_size,
    n_steps) -> (params, opt_state, mean_loss)``: ``n_steps`` optimizer
    updates chained in one ``lax.scan`` dispatch, each on a fresh
    with-replacement minibatch drawn on device (host stays out of the
    loop). ``pool`` feeds the student; ``t_pool`` feeds the teacher at the
    SAME row indices -- pass the same array for shared inputs (the image
    case), or a row-aligned transformed view for cross-representation
    distillation (e.g. an scBERT teacher reading gene2vec-binned tokens
    while the CountMLP student reads raw log1p counts of the same spots).

    The loss is ``mse_weight * MSE(student_logits, teacher_logits) +
    kl_weight * T^2 * KL(softmax(t/T) || softmax(s/T))`` -- MSE drives
    corrector-input fidelity (g consumes raw logits), KL sharpens argmax
    boundaries. The student must be stateless (no BatchNorm collections;
    use ``CountMLP(batch_norm=False)`` / ``TpuPatchClassifier``).
    """
    batch_axis = 0

    def loss_fn(params, s_in, t_in):
        t_logits = jax.lax.stop_gradient(
            teacher_apply(t_in).astype(jnp.float32))
        s_logits = student.apply({"params": params}, s_in,
                                 train=True).astype(jnp.float32)
        mse = jnp.mean((s_logits - t_logits) ** 2)
        T = temperature
        t_soft = jax.nn.log_softmax(t_logits / T, -1)
        s_soft = jax.nn.log_softmax(s_logits / T, -1)
        kl = jnp.mean(jnp.sum(jnp.exp(t_soft) * (t_soft - s_soft), -1))
        return mse_weight * mse + kl_weight * (T * T) * kl

    @functools.partial(jax.jit, static_argnames=("batch_size", "n_steps"))
    def run(params, opt_state, pool, t_pool, key, batch_size, n_steps):
        def body(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(k, (batch_size,), 0,
                                     pool.shape[batch_axis])
            s_in = jnp.take(pool, idx, axis=batch_axis)
            t_in = jnp.take(t_pool, idx, axis=batch_axis)
            loss, grads = jax.value_and_grad(loss_fn)(params, s_in, t_in)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, n_steps))
        return params, opt_state, jnp.mean(losses)

    return run


def distill_patch_classifier(teacher_apply: Callable, student, patches,
                             *, steps: int = 2000, batch_size: int = 256,
                             learning_rate: float = 3e-4,
                             temperature: float = 2.0,
                             kl_weight: float = 0.1,
                             mse_weight: float = 1.0,
                             scan_chunk: int = 100,
                             teacher_inputs=None,
                             rng=None, student_params=None,
                             verbose: bool = True):
    """Distill a frozen teacher f into ``student`` over an input pool.

    Input-shape agnostic: works for image patch pools (the CLI ``distill``
    path) and for 1-D expression vectors (distilling an scBERT count-f
    into a ``CountMLP(batch_norm=False)`` student -- the 105 spots/s ->
    multi-M spots/s count-serving lever, see tests/test_distill.py).

    Args:
      teacher_apply: ``teacher_apply(x) -> (B, C)`` frozen-teacher logits
        closure over the teacher's input representation.
      student: a stateless flax module mapping student inputs to (B, C)
        logits.
      patches: (N, ...) student input pool, host or device resident.
      teacher_inputs: optional (N, ...) row-aligned TEACHER input pool for
        cross-representation distillation (e.g. gene2vec-binned tokens for
        an scBERT teacher while the student reads raw log1p counts of the
        same spots). Default: the teacher reads ``patches``.
      steps: total optimizer updates (with-replacement minibatches).
      scan_chunk: updates fused per device dispatch.

    Returns:
      ``({"params": ...}, losses)`` -- the distilled student variables and
      the per-chunk mean loss history.
    """
    rng = rng if rng is not None else jax.random.key(0)
    pool = jnp.asarray(patches)
    t_pool = pool if teacher_inputs is None else jnp.asarray(teacher_inputs)
    if len(t_pool) != len(pool):
        raise ValueError(f"teacher_inputs has {len(t_pool)} rows vs the "
                         f"student pool's {len(pool)}; they must be "
                         "row-aligned views of the same items")
    if student_params is None:
        k_init, rng = jax.random.split(rng)
        student_params = student.init(
            k_init, pool[:1].astype(jnp.float32))["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(student_params)
    run = make_distill_step(teacher_apply, student, tx,
                            temperature=temperature, kl_weight=kl_weight,
                            mse_weight=mse_weight)
    losses = []
    done = 0
    while done < steps:
        n = min(scan_chunk, steps - done)
        rng, k = jax.random.split(rng)
        student_params, opt_state, mean_loss = run(
            student_params, opt_state, pool, t_pool, k,
            batch_size=batch_size, n_steps=n)
        losses.append(float(mean_loss))
        done += n
        if verbose:
            print(f"distill step {done}/{steps}: loss {losses[-1]:.5f}",
                  flush=True)
    return {"params": student_params}, losses


def patch_agreement(teacher_apply: Callable, student_apply: Callable,
                    patches, batch_size: int = 512) -> float:
    """Fraction of patches where teacher and student argmax agree."""
    patches = np.asarray(patches)
    n = len(patches)
    if n == 0:
        raise ValueError("empty patch pool")
    agree = 0
    for i in range(0, n, batch_size):
        chunk = jnp.asarray(patches[i:i + batch_size])
        t = np.asarray(jnp.argmax(teacher_apply(chunk), -1))
        s = np.asarray(jnp.argmax(student_apply(chunk), -1))
        agree += int((t == s).sum())
    return agree / n


def label_agreement(labels_a, labels_b) -> float:
    """Per-spot agreement of two registration label grids over the UNION
    foreground (0 = background; bg/fg structure counts as disagreement)."""
    a, b = np.asarray(labels_a), np.asarray(labels_b)
    fg = (a > 0) | (b > 0)
    n = int(fg.sum())
    if n == 0:
        raise ValueError("no foreground spots to compare")
    return float((a[fg] == b[fg]).sum() / n)


def write_count_distilled_mm_dir(out_dir, teacher_meta: dict, classes,
                                 teacher_variables, student_f_variables,
                                 distill_info: Optional[dict] = None):
    """Write a multimodal model dir whose scBERT count-f is replaced by a
    distilled ``CountMLP(batch_norm=False)`` student.

    The image classifier and correction network (params, batch_stats, any
    image-side extra collections) are carried VERBATIM; the count side
    switches to ``count_f='mlp'`` with ``log1p`` preprocessing (the
    student was distilled on raw log1p counts -- cross-representation,
    see :func:`distill_patch_classifier`'s ``teacher_inputs``) and the
    scBERT FAVOR projections are dropped. register/evaluate/serve load
    the directory unchanged (modeldir contract; ``count_mlp_bn`` marks
    the stateless student).
    """
    from gridnext_tpu.train import save_checkpoint
    from gridnext_tpu.train.loops import TrainState

    params = dict(teacher_variables["params"])
    params["count_classifier"] = student_f_variables["params"]
    batch_stats = teacher_variables.get("batch_stats")
    if batch_stats is not None:
        batch_stats = {k: v for k, v in batch_stats.items()
                       if k != "count_classifier"} or None
    extra = {}
    for col, sub in teacher_variables.items():
        if col in ("params", "batch_stats"):
            continue
        kept = {k: v for k, v in sub.items() if k != "count_classifier"}
        if kept:
            extra[col] = kept

    meta = dict(teacher_meta)
    meta.update({
        "classes": list(classes),
        "count_f": "mlp",
        "log1p": True,
        "count_mlp_bn": False,
        "count_chunk": None,   # MLP needs no scBERT-sized chunking
        "count_distilled_from": "scbert",
    })
    if distill_info:
        meta["distill"] = {k: (round(float(v), 6)
                               if isinstance(v, (int, float)) else v)
                           for k, v in distill_info.items()}
    os.makedirs(out_dir, exist_ok=True)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=None, step=jnp.zeros((), jnp.int32),
                       extra_vars=extra)
    save_checkpoint(os.path.join(out_dir, "g_state.msgpack"), state,
                    include_opt_state=False)
    with open(os.path.join(out_dir, "model.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    return meta


def write_distilled_model_dir(out_dir, teacher_meta: dict, classes,
                              teacher_variables, student_f_variables,
                              student, distill_info: Optional[dict] = None):
    """Write a standard trained-model directory serving the distilled f.

    The student f's params replace ``patch_classifier``; the teacher's
    correction network (params + batch_stats) is carried VERBATIM, so
    register/evaluate/export/serve all load the directory unchanged
    (modeldir.py contract) and run the measured fast path. ``model.json``
    keeps the teacher's lattice/preprocessing fields, switches the f
    architecture fields, and records distillation provenance.
    """
    from gridnext_tpu.models.tpu_f import tpu_f_arch_meta
    from gridnext_tpu.train import save_checkpoint
    from gridnext_tpu.train.loops import TrainState

    params = {"patch_classifier": student_f_variables["params"],
              "corrector": teacher_variables["params"]["corrector"]}
    batch_stats = None
    if (teacher_variables.get("batch_stats") or {}).get("corrector") is not None:
        batch_stats = {
            "corrector": teacher_variables["batch_stats"]["corrector"]}

    g_name = ("GridNet" if teacher_meta.get("grid_dims") is not None
              else "GridNetHex")
    meta = {k: teacher_meta.get(k) for k in
            ("patch_px", "window_px", "grid_dims", "hd_binning",
             "patch_chunk", "dense_ingest")}
    meta.update({
        "model": f"{g_name}+TpuPatchClassifier",
        "image_f": "tpu",
        "tpu_f": tpu_f_arch_meta(student),
        "classes": list(classes),
        "distilled_from": teacher_meta.get("model"),
    })
    if distill_info:
        meta["distill"] = {k: (round(float(v), 6)
                               if isinstance(v, (int, float)) else v)
                           for k, v in distill_info.items()}
    os.makedirs(out_dir, exist_ok=True)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    save_checkpoint(os.path.join(out_dir, "g_state.msgpack"), state,
                    include_opt_state=False)
    with open(os.path.join(out_dir, "model.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    return meta
