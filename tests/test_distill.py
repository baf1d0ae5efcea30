"""Checkpoint-parity fast serving via f-distillation (train/distill.py +
CLI `distill`; VERDICT r3 #2).

The end-to-end case: a trained teacher f inside a GridNetHex model dir is
distilled into a (differently shaped) TpuPatchClassifier student; the
teacher's corrector is carried verbatim; agreement is MEASURED at the
patch level and through full-slide registration, and the student dir
round-trips through the standard register path.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gridnext_tpu import geometry as G
from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
from gridnext_tpu.models import GridNetHex, TpuPatchClassifier
from gridnext_tpu.train import (
    distill_patch_classifier,
    label_agreement,
    patch_agreement,
    write_distilled_model_dir,
)

PATCH = 16


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("distill")
    sims = [simulate_spaceranger_dir(root / f"a{i}", seed=i, n_genes=8,
                                     n_classes=3, image=True,
                                     spot_spacing_px=PATCH)
            for i in range(3)]
    srdirs = [s["spaceranger_dir"] for s in sims]
    images = [s["image_file"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    return root, sims, srdirs, images, annots


@pytest.fixture(scope="module")
def teacher_dir(cohort):
    """A small TRAINED teacher f (real logit margins) inside a standard
    GridNetHex model dir."""
    root, sims, srdirs, images, annots = cohort
    spots = create_visium_dataset(srdirs, use_count=False, use_image=True,
                                  spatial=False, annot_files=annots,
                                  fullres_image_files=images,
                                  patch_size_px=PATCH)
    X, y = spots.materialize()
    f = TpuPatchClassifier(n_classes=len(spots.classes),
                           stages=((64, 1),), stem_patch=8)
    variables = f.init(jax.random.key(0), jnp.asarray(X[:1]))
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, xb, yb):
        def lf(p):
            logits = f.apply({"params": p}, xb, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(lf)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    rng = np.random.default_rng(0)
    params = variables["params"]
    for _ in range(120):
        idx = rng.integers(0, len(X), 64)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(X[idx]),
                                       jnp.asarray(y[idx]))
    assert float(loss) < 0.5, f"teacher failed to train: CE {float(loss)}"

    g = GridNetHex(patch_classifier=f, n_classes=len(spots.classes))
    gvars = g.init(jax.random.key(1),
                   jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                              PATCH, PATCH, 3)))
    tvars = {"params": {"patch_classifier": params,
                        "corrector": gvars["params"]["corrector"]},
             "batch_stats": {"corrector": gvars["batch_stats"]["corrector"]}}
    out = root / "teacher"
    write_distilled_model_dir(str(out), {"patch_px": PATCH}, spots.classes,
                              tvars, {"params": params}, f)
    return str(out), tvars, spots.classes


def test_distill_matches_trained_teacher(cohort, teacher_dir):
    """Library path: distilled student reproduces teacher argmax on held-out
    patches and the loss history decreases."""
    root, sims, srdirs, images, annots = cohort
    tdir, tvars, classes = teacher_dir
    from gridnext_tpu.modeldir import image_f_from_meta, load_model_dir

    meta, cls, variables = load_model_dir(tdir)
    teacher_f, teacher_f_vars = image_f_from_meta(meta, cls, variables)

    spots = create_visium_dataset(srdirs, use_count=False, use_image=True,
                                  spatial=False, patch_size_px=PATCH)
    X, _ = spots.materialize()

    def teacher_apply(p):
        return teacher_f.apply(teacher_f_vars, p, train=False)

    student = TpuPatchClassifier(n_classes=len(cls),
                                 stages=((128, 1),), stem_patch=8)
    svars, losses = distill_patch_classifier(
        teacher_apply, student, X[:-100], steps=300, batch_size=64,
        verbose=False)
    assert losses[-1] < losses[0] * 0.5

    agr = patch_agreement(
        teacher_apply, lambda p: student.apply(svars, p, train=False),
        X[-100:])
    assert agr >= 0.98, f"holdout agreement {agr}"


@pytest.mark.slow
def test_cli_distill_end_to_end(cohort, teacher_dir, tmp_path):
    """CLI flow: distill writes a student model dir with measured agreement
    recorded; register serves it; full-slide labels match the teacher's."""
    from PIL import Image

    from gridnext_tpu.cli import main
    from gridnext_tpu.io import read_positions
    from gridnext_tpu.modeldir import (image_registrar_from_meta,
                                       load_model_dir)

    root, sims, srdirs, images, annots = cohort
    tdir, tvars, classes = teacher_dir
    sdir = str(tmp_path / "student")
    main(["distill", "--model", tdir,
          "--spaceranger", *srdirs, "--images", *images,
          "--out", sdir, "--steps", "300", "--batch-size", "64",
          "--student-stages", "128:1", "--student-stem", "8",
          "--max-patches", "2000",   # exercises the pool-sampling branch
          "--min-agreement", "0.97"])

    with open(os.path.join(sdir, "model.json")) as fh:
        meta = json.load(fh)
    assert meta["model"] == "GridNetHex+TpuPatchClassifier"
    assert meta["distill"]["patch_agreement"] >= 0.97
    assert meta["distill"]["label_agreement"] >= 0.97
    assert meta["distilled_from"] == "GridNetHex+TpuPatchClassifier"

    # the student dir registers through the standard path, agreeing with
    # the teacher registrar on a slide
    t_meta, t_cls, t_vars = load_model_dir(tdir)
    s_meta, s_cls, s_vars = load_model_dir(sdir)
    reg_t = image_registrar_from_meta(t_meta, t_cls, t_vars)
    reg_s = image_registrar_from_meta(s_meta, s_cls, s_vars)
    wsi = jnp.asarray(np.asarray(Image.open(images[0])))
    pos = read_positions(srdirs[0])
    agr = label_agreement(reg_t(wsi, pos), reg_s(wsi, pos))
    assert agr >= 0.97, f"label agreement {agr}"

    # CLI register accepts the student dir and writes a Loupe CSV
    out_csv = tmp_path / "labels.csv"
    main(["register", "--model", sdir, "--spaceranger", srdirs[0],
          "--images", images[0], "--out", str(out_csv)])
    assert out_csv.exists(), "register wrote no CSV from the distilled dir"
    import pandas as pd

    assert len(pd.read_csv(out_csv)) > 0


def test_agreement_helpers():
    a = np.array([[0, 1, 2], [0, 3, 1]])
    b = np.array([[0, 1, 1], [0, 3, 1]])
    assert label_agreement(a, a) == 1.0
    assert label_agreement(a, b) == pytest.approx(3 / 4)
    # bg/fg divergence counts as disagreement over the union support
    c = np.array([[1, 1, 2], [0, 3, 1]])
    assert label_agreement(a, c) == pytest.approx(4 / 5)
    with pytest.raises(ValueError, match="foreground"):
        label_agreement(np.zeros((2, 2)), np.zeros((2, 2)))

    with pytest.raises(ValueError, match="empty"):
        patch_agreement(lambda p: p, lambda p: p, np.zeros((0, 4, 4, 3)))


def test_distill_scbert_count_f_into_mlp():
    """Cross-representation count distillation: an scBERT count-f teacher
    (reads binned tokens) distills into a CountMLP student (reads raw
    log1p counts of the SAME spots) via teacher_inputs= -- the serving
    lever for the slowest model in the zoo (scBERT serves ~105 spots/s on
    v5e vs multi-M for the MLP path, docs/roadmap.md)."""
    import optax

    from gridnext_tpu.models import CountMLP, scBERT

    rng = np.random.default_rng(0)
    n_genes, C, N = 32, 3, 600
    # class-structured expression: per-class gamma rates -> poisson counts
    rates = np.random.default_rng(1).gamma(2.0, 2.0, size=(C, n_genes))
    y = rng.integers(0, C, N)
    counts = rng.poisson(rates[y]).astype(np.float32)
    log1p = np.log1p(counts)
    binned = np.minimum(np.floor(log1p), 5.0).astype(np.float32)  # teacher view

    teacher = scBERT(n_genes=n_genes, dim=16, depth=1, heads=2,
                     nb_features=8, n_classes=C, generalized_attention=True)
    tvars = teacher.init(jax.random.key(0), jnp.asarray(binned[:1]))
    t_extra = {k: v for k, v in tvars.items() if k != "params"}

    def t_apply_p(params, x):
        return teacher.apply({"params": params, **t_extra}, x, train=False)

    tx = optax.adam(1e-3)
    opt = tx.init(tvars["params"])

    @jax.jit
    def step(params, opt, xb, yb):
        def lf(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                t_apply_p(p, xb), yb).mean()

        loss, grads = jax.value_and_grad(lf)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    params = tvars["params"]
    for i in range(120):
        idx = rng.integers(0, 500, 64)
        params, opt, loss = step(params, opt, jnp.asarray(binned[idx]),
                                 jnp.asarray(y[idx]))
    assert float(loss) < 0.7, f"scBERT teacher failed to train: {float(loss)}"

    def teacher_apply(x):
        return t_apply_p(params, x)

    student = CountMLP(n_classes=C, batch_norm=False)
    svars, losses = distill_patch_classifier(
        teacher_apply, student, log1p[:500], teacher_inputs=binned[:500],
        steps=400, batch_size=64, verbose=False)
    assert losses[-1] < losses[0] * 0.5

    # held-out agreement: student argmax (on raw log1p) vs teacher argmax
    # (on its binned view) of the SAME spots
    t_lab = np.asarray(jnp.argmax(teacher_apply(jnp.asarray(binned[500:])), -1))
    s_lab = np.asarray(jnp.argmax(
        student.apply(svars, jnp.asarray(log1p[500:]), train=False), -1))
    agr = float((t_lab == s_lab).mean())
    assert agr >= 0.95, f"count distill agreement {agr}"

    # row misalignment fails fast
    with pytest.raises(ValueError, match="row-aligned"):
        distill_patch_classifier(teacher_apply, student, log1p[:500],
                                 teacher_inputs=binned[:400], steps=1,
                                 verbose=False)


@pytest.mark.slow
def test_cli_distill_mm_count_f(tmp_path):
    """CLI `distill` on a multimodal dir with an scBERT count-f: the count
    classifier distills into a stateless CountMLP student (reading raw
    log1p counts), the image f + corrector carry verbatim, agreement is
    measured at the count-f and full-MM level, and the student dir
    round-trips through CLI register."""
    import json

    import optax

    from gridnext_tpu.cli import main
    from gridnext_tpu.io.unify import read_unified_genes, unified_cache_path
    from gridnext_tpu.modeldir import scbert_count_transform
    from gridnext_tpu.models import GridNetHexMM, scBERT
    from gridnext_tpu.models.scbert import load_gene2vec_names
    from gridnext_tpu.models.tpu_f import tpu_f_arch_meta
    from gridnext_tpu.train import save_checkpoint
    from gridnext_tpu.train.loops import TrainState

    g2v = load_gene2vec_names()
    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=15,
                                     n_classes=3, image=True,
                                     spot_spacing_px=PATCH,
                                     gene_names=g2v[:15]) for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    imgs = [s["image_file"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    classes = ["Layer1", "Layer2", "Layer3"]

    # spot count pool + labels (annotations) for teacher training
    spots = create_visium_dataset(dirs, spatial=False, use_count=True,
                                  use_image=False, annot_files=annots,
                                  minimum_detection_rate=None)
    raw, y = spots.materialize()
    vocab = 64
    transform, _ = scbert_count_transform(dirs, None, vocab)
    tok = transform(raw)

    scb = scBERT(n_genes=vocab, dim=16, depth=1, heads=2, nb_features=8,
                 n_classes=3, generalized_attention=True)
    svars0 = scb.init(jax.random.key(0), jnp.asarray(tok[:1]))
    extra = {k: v for k, v in svars0.items() if k != "params"}
    tx = optax.adam(1e-3)
    opt = tx.init(svars0["params"])

    @jax.jit
    def step(params, opt, xb, yb):
        def lf(p):
            logits = scb.apply({"params": p, **extra}, xb, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(lf)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    rng = np.random.default_rng(0)
    params = svars0["params"]
    for _ in range(120):
        idx = rng.integers(0, len(tok), 64)
        params, opt, loss = step(params, opt, jnp.asarray(tok[idx]),
                                 jnp.asarray(y[idx]))
    assert float(loss) < 0.8, f"scBERT teacher undertrained: {float(loss)}"

    # assemble the MM teacher dir (tiny TPU image f + hex corrector)
    f_img = TpuPatchClassifier(n_classes=3, stages=((64, 1),), stem_patch=8)
    mm = GridNetHexMM(image_classifier=f_img, count_classifier=scb,
                      n_classes=3)
    xi0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, PATCH, PATCH, 3))
    xc0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, vocab))
    mm_vars = mm.init(jax.random.key(1), (xi0, xc0))
    mm_params = dict(mm_vars["params"])
    mm_params["count_classifier"] = params
    favor = dict(mm_vars.get("favor", {}))
    favor["count_classifier"] = extra.get("favor", {})
    tdir = tmp_path / "mm_teacher"
    tdir.mkdir()
    genes = read_unified_genes(unified_cache_path(dirs[0]))
    meta = {"classes": classes, "patch_px": PATCH, "window_px": None,
            "patch_chunk": 624, "count_chunk": None,
            "n_genes": len(genes), "genes": list(genes), "log1p": False,
            "count_f": "scbert", "scbert_vocab": vocab, "scbert_dim": 16,
            "scbert_depth": 1, "scbert_heads": 2, "scbert_dim_head": 64,
            "scbert_features": 8, "hd_binning": None, "grid_dims": None,
            "image_f": "tpu", "tpu_f": tpu_f_arch_meta(f_img),
            "dense_ingest": False, "model": "GridNetHexMM"}
    with open(tdir / "model.json", "w") as fh:
        json.dump(meta, fh)
    save_checkpoint(
        tdir / "g_state.msgpack",
        TrainState(params=mm_params,
                   batch_stats=mm_vars.get("batch_stats"),
                   opt_state=None, step=jnp.zeros((), jnp.int32),
                   extra_vars={"favor": favor}),
        include_opt_state=False)

    sdir = tmp_path / "mm_student"
    main(["distill", "--model", str(tdir), "--spaceranger", *dirs,
          "--images", *imgs, "--out", str(sdir), "--steps", "400",
          "--batch-size", "64"])

    smeta = json.load(open(sdir / "model.json"))
    assert smeta["count_f"] == "mlp" and smeta["count_mlp_bn"] is False
    assert smeta["log1p"] is True
    assert smeta["count_distilled_from"] == "scbert"
    assert smeta["distill"]["count_f_agreement"] >= 0.95
    assert smeta["distill"]["label_agreement"] >= 0.85

    # the student dir registers through the standard MM path
    out_csv = tmp_path / "mm_labels.csv"
    main(["register", "--model", str(sdir), "--spaceranger", dirs[0],
          "--images", imgs[0], "--out", str(out_csv)])
    assert out_csv.exists()
    import pandas as pd

    assert len(pd.read_csv(out_csv)) > 0


def test_submodule_variables_extraction():
    """modeldir.submodule_variables: the ONE extraction rule -- params,
    batch_stats, and any extra collections that carry the submodule travel;
    collections without it are dropped."""
    from gridnext_tpu.modeldir import submodule_variables

    variables = {
        "params": {"patch_classifier": {"w": 1}, "corrector": {"w": 2}},
        "batch_stats": {"corrector": {"mean": 0}},
        "favor": {"patch_classifier": {"proj": 3}},
    }
    f = submodule_variables(variables, "patch_classifier")
    assert f == {"params": {"w": 1}, "favor": {"proj": 3}}
    c = submodule_variables(variables, "corrector")
    assert c == {"params": {"w": 2}, "batch_stats": {"mean": 0}}
    # None collections (a stateless model's batch_stats slot) are skipped
    v2 = {"params": {"x": {"w": 1}}, "batch_stats": None}
    assert submodule_variables(v2, "x") == {"params": {"w": 1}}


@pytest.mark.slow
def test_distill_from_converted_torch_teacher(cohort):
    """The measured distillation-parity claim must span the torch->flax
    CONVERSION boundary, not just flax-trained teachers (VERDICT r4 #3):
    briefly train the reference's own torch DenseNet (densenet.py:78) on
    CPU, convert it with compat.densenet_from_torch, distill the converted
    teacher into a TpuPatchClassifier student, and pin held-out label
    agreement >= 0.99."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    from gridnext.densenet import DenseNet as TorchDenseNet

    from gridnext_tpu.compat import densenet_from_torch
    from gridnext_tpu.models import DenseNet

    root, sims, srdirs, images, annots = cohort
    spots = create_visium_dataset(srdirs, use_count=False, use_image=True,
                                  spatial=False, annot_files=annots,
                                  fullres_image_files=images,
                                  patch_size_px=PATCH)
    X, y = spots.materialize()
    n_classes = len(spots.classes)
    n_hold = 256
    X_tr, y_tr = X[:-n_hold], y[:-n_hold]
    X_ho = X[-n_hold:]

    # --- 1) train the reference torch DenseNet briefly on CPU -------------
    torch.manual_seed(0)
    tm = TorchDenseNet(growth_rate=4, block_config=(2, 2), compression=0.5,
                       num_init_features=8, bn_size=4, drop_rate=0,
                       num_classes=n_classes, small_inputs=True,
                       efficient=False)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    lossf = torch.nn.CrossEntropyLoss()
    rng = np.random.default_rng(0)
    tm.train()
    for _ in range(250):
        idx = rng.integers(0, len(X_tr), 64)
        xb = torch.from_numpy(X_tr[idx].transpose(0, 3, 1, 2).copy())
        yb = torch.from_numpy(y_tr[idx]).long()
        opt.zero_grad()
        loss = lossf(tm(xb), yb)
        loss.backward()
        opt.step()
    assert float(loss) < 0.7, f"torch teacher failed to train: {float(loss)}"
    tm.eval()

    # --- 2) convert; pin the conversion boundary itself --------------------
    tvars = densenet_from_torch(tm.state_dict(), block_config=(2, 2),
                                small_inputs=True)
    teacher = DenseNet(growth_rate=4, block_config=(2, 2),
                       num_init_features=8, bn_size=4, num_classes=n_classes,
                       small_inputs=True)
    with torch.no_grad():
        want = tm(torch.from_numpy(
            X_ho[:32].transpose(0, 3, 1, 2).copy())).numpy()
    got = np.asarray(teacher.apply(tvars, jnp.asarray(X_ho[:32]),
                                   train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # --- 3) distill the CONVERTED teacher into the TPU-shaped student -----
    def teacher_apply(p):
        return teacher.apply(tvars, p, train=False)

    student = TpuPatchClassifier(n_classes=n_classes, stages=((128, 1),),
                                 stem_patch=8)
    svars, losses = distill_patch_classifier(
        teacher_apply, student, X_tr, steps=600, batch_size=128,
        verbose=False)
    assert losses[-1] < losses[0] * 0.5

    # --- 4) held-out label agreement across conversion + distillation -----
    agr = patch_agreement(
        teacher_apply, lambda p: student.apply(svars, p, train=False), X_ho)
    assert agr >= 0.99, f"holdout agreement {agr} (claim bound is 0.99)"
