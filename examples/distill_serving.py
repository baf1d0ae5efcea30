"""Checkpoint-parity FAST serving via distillation, end to end.

The recipe behind the CLI `distill` subcommand (train/distill.py,
VERDICT r3 #2), runnable on simulated data with zero downloads:

  1. simulate an annotated Visium cohort with H&E-style images;
  2. train a teacher spot classifier f briefly (stands in for a converted
     reference DenseNet-121 checkpoint -- swap in
     ``compat.torch_convert.densenet_from_torch`` weights when you have
     the real .pth) and wrap it in a standard GridNetHex model dir;
  3. `distill` it into the TPU-shaped ``TpuPatchClassifier`` student --
     the teacher's correction network g is carried VERBATIM, so the
     student dir serves the same pipeline semantics at student speed
     (~10x DenseNet-121 on a v5e, docs/roadmap.md);
  4. register a slide through BOTH model dirs and report the measured
     full-slide label agreement and per-slide wall times.

Run (CPU, ~3 min):   python examples/distill_serving.py
Smaller/faster:      python examples/distill_serving.py --steps 150
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arrays", type=int, default=3)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=300,
                    help="distillation steps")
    ap.add_argument("--teacher-steps", type=int, default=120)
    ap.add_argument("--out", default=None,
                    help="working directory (default: a temp dir)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gridnext_tpu import geometry as G
    from gridnext_tpu.cli import main as cli
    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.io import read_positions
    from gridnext_tpu.modeldir import image_registrar_from_meta, load_model_dir
    from gridnext_tpu.models import GridNetHex, TpuPatchClassifier
    from gridnext_tpu.train import label_agreement, write_distilled_model_dir

    root = Path(args.out) if args.out else Path(tempfile.mkdtemp())
    sims = [simulate_spaceranger_dir(root / f"a{i}", seed=i, n_genes=8,
                                     n_classes=3, image=True,
                                     spot_spacing_px=args.patch)
            for i in range(args.arrays)]
    srdirs = [s["spaceranger_dir"] for s in sims]
    images = [s["image_file"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    # --- teacher: brief supervised training on the simulated patches ------
    spots = create_visium_dataset(srdirs, use_count=False, use_image=True,
                                  spatial=False, annot_files=annots,
                                  fullres_image_files=images,
                                  patch_size_px=args.patch)
    X, y = spots.materialize()
    teacher_f = TpuPatchClassifier(n_classes=len(spots.classes),
                                   stages=((64, 1),), stem_patch=8)
    params = teacher_f.init(jax.random.key(0), jnp.asarray(X[:1]))["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, yb):
        def lf(p):
            logits = teacher_f.apply({"params": p}, xb, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(lf)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    rng = np.random.default_rng(0)
    for i in range(args.teacher_steps):
        idx = rng.integers(0, len(X), 64)
        params, opt, loss = step(params, opt, jnp.asarray(X[idx]),
                                 jnp.asarray(y[idx]))
    print(f"teacher trained: CE {float(loss):.4f} on {len(X)} patches")

    g = GridNetHex(patch_classifier=teacher_f, n_classes=len(spots.classes))
    gvars = g.init(jax.random.key(1),
                   jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                              args.patch, args.patch, 3)))
    tvars = {"params": {"patch_classifier": params,
                        "corrector": gvars["params"]["corrector"]},
             "batch_stats": {"corrector": gvars["batch_stats"]["corrector"]}}
    teacher_dir = root / "teacher"
    write_distilled_model_dir(str(teacher_dir), {"patch_px": args.patch},
                              spots.classes, tvars, {"params": params},
                              teacher_f)

    # --- distill through the CLI (measures + records agreement) -----------
    student_dir = root / "student"
    cli(["distill", "--model", str(teacher_dir),
         "--spaceranger", *srdirs, "--images", *images,
         "--out", str(student_dir), "--steps", str(args.steps),
         "--batch-size", "64", "--student-stages", "128:1",
         "--student-stem", "8"])

    # --- serve a slide through both dirs; compare labels + wall time ------
    from PIL import Image

    def timed_register(mdir, wsi, pos):
        meta, classes, variables = load_model_dir(str(mdir))
        reg = image_registrar_from_meta(meta, classes, variables)
        labels = reg(wsi, pos)                       # compile + run
        t0 = time.perf_counter()
        labels = reg(wsi, pos)
        return labels, time.perf_counter() - t0

    wsi = jnp.asarray(np.asarray(Image.open(images[0])))
    pos = read_positions(srdirs[0])
    lt, t_t = timed_register(teacher_dir, wsi, pos)
    ls, t_s = timed_register(student_dir, wsi, pos)
    agr = label_agreement(lt, ls)
    print(f"full-slide label agreement teacher vs student: {agr:.4f}")
    print(f"per-slide wall: teacher {t_t * 1e3:.0f} ms, student "
          f"{t_s * 1e3:.0f} ms (architectural gap shows on TPU: 18.8k vs "
          "192.7k spots/s at reference scale, docs/roadmap.md)")
    return {"agreement": agr, "teacher_s": t_t, "student_s": t_s}


if __name__ == "__main__":
    main()
