"""Whole-stack cross-framework replay (one test proving end-to-end parity
through the reference's OWN pipeline functions, not just its modules).

Flow:
  1. simulate a small Visium cohort (shared files);
  2. run the REFERENCE pipeline verbatim on it: ``visium_datasets.
     create_visium_dataset`` (generates the `.unified.tsv.gz` caches with the
     reference's own ETL) -> ``training.train_gridwise`` over the Cartesian
     ``GridNet`` (gridnet_models.py:23-119, torch; optimizing both f and the
     corrector via the ``f_opt`` hook, training.py:102) ->
     ``utils.all_fgd_predictions`` (utils.py:20-57);
  3. convert the trained torch checkpoint
     (compat.count_mlp_from_torch + compat.gridnet_from_torch);
  4. run OUR pipeline on the SAME files -- ``data.create_visium_dataset``
     (consuming the reference-written count caches unchanged) ->
     ``models.GridNet`` -> ``evaluate.all_fgd_predictions`` -- and assert it
     reproduces the reference's foreground label maps to fp tolerance.

Import stubs: the environment lacks anndata/torchvision/hexagdly, which are
import-time dependencies of visium_datasets/imgprocess/gridnet_models that
the count-grid path never calls (hexagdly is only instantiated by the hex
correctors; anndata/torchvision only by the AnnData/image builders). Minimal
module stubs are installed for the imports and removed afterwards.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

H_ST, W_ST = 78, 64


@pytest.fixture(scope="module")
def ref_modules():
    stubs = []

    def ensure(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        stubs.append(name)
        return m

    # Functional shims for the two transforms the reference's image loaders
    # bind at import (image_datasets.py:14): torchvision semantics --
    # ToTensor: PIL/ndarray HWC uint8 -> CHW float32 in [0, 1];
    # Compose: sequential application. Pinned against manual math in the
    # image replay test below.
    class _ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tv = ensure("torchvision")
    tvt = ensure("torchvision.transforms", Compose=_Compose,
                 ToPILImage=None, ToTensor=_ToTensor)
    if not hasattr(tv, "transforms"):
        tv.transforms = tvt
    ensure("anndata", AnnData=object, read_h5ad=None)
    ensure("hexagdly", Conv2d=object)

    sys.path.insert(0, "/root/reference")
    try:
        mods = tuple(importlib.import_module(f"gridnext.{m}") for m in
                     ("visium_datasets", "gridnet_models", "training",
                      "utils"))
        yield mods
    finally:
        sys.path.remove("/root/reference")
        for name in stubs:
            sys.modules.pop(name, None)


class _GridMajor(torch.utils.data.Dataset):
    """CountGridDataset emits channels-first (G, H, W); the Cartesian GridNet
    base consumes grid-major (H, W, feats) inputs -- the same permute the
    tutorial's GridNetHexOddr wrapper applies internally for 1-D spot
    features (gridnet_models.py:165-171)."""

    def __init__(self, ds, idx):
        self.ds, self.idx = ds, idx

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        x, y = self.ds[self.idx[i]]
        return x.permute(1, 2, 0).contiguous(), y


def test_reference_pipeline_replay(ref_modules, tmp_path):
    vd, gm, tr, ut = ref_modules
    from torch.utils.data import DataLoader

    from gridnext_tpu.compat import count_mlp_from_torch, gridnet_from_torch
    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import CountMLP, GridNet

    sims = [simulate_spaceranger_dir(tmp_path / f"array{i}", seed=100 + i,
                                     n_genes=24, n_classes=3)
            for i in range(3)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    # --- reference ETL: factory generates the unified count caches --------
    gdat = vd.create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                    use_image=False, spatial=True)
    cache_files = [os.path.join(d, os.path.basename(d) + ".unified.tsv.gz")
                   for d in dirs]
    assert all(os.path.exists(c) for c in cache_files)
    cache_sig = [(os.path.getmtime(c), os.path.getsize(c))
                 for c in cache_files]

    x0, y0 = gdat[0]
    n_genes = x0.shape[0]
    n_classes = len(gdat.classes)
    assert x0.shape == (n_genes, H_ST, W_ST) and y0.shape == (H_ST, W_ST)

    # --- reference model + training loop (tutorial cell 12 f; Cartesian g)
    torch.manual_seed(0)
    f_torch = torch.nn.Sequential(
        torch.nn.Linear(n_genes, 500), torch.nn.Linear(500, 100),
        torch.nn.BatchNorm1d(100), torch.nn.ReLU(),
        torch.nn.Linear(100, 100), torch.nn.Linear(100, 50),
        torch.nn.BatchNorm1d(50), torch.nn.ReLU(),
        torch.nn.Linear(50, n_classes))
    model = gm.GridNet(f_torch, (n_genes,), (H_ST, W_ST),
                       n_classes=n_classes, use_bn=True)
    loaders = {
        "train": DataLoader(_GridMajor(gdat, [1, 2]), batch_size=1,
                            shuffle=True),
        "val": DataLoader(_GridMajor(gdat, [0]), batch_size=1),
    }
    criterion = torch.nn.CrossEntropyLoss()
    g_opt = torch.optim.Adam(model.corrector.parameters(), lr=1e-2)
    f_opt = torch.optim.Adam(model.patch_classifier.parameters(), lr=1e-3)
    model, _, _ = tr.train_gridwise(model, loaders, criterion, g_opt,
                                    num_epochs=2, f_opt=f_opt)

    ref_true, ref_pred, ref_smax = ut.all_fgd_predictions(loaders["val"],
                                                          model)
    _, _, ref_smax_f = ut.all_fgd_predictions(loaders["val"], model,
                                              f_only=True)

    # --- our ETL on the SAME files: consumes the reference-written caches -
    ours = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True)
    assert [(os.path.getmtime(c), os.path.getsize(c))
            for c in cache_files] == cache_sig, \
        "our factory must reuse the reference's unified caches, not rebuild"
    assert list(ours.classes) == list(gdat.classes)
    Xg, Yg = ours.materialize()
    assert Xg.shape == (3, H_ST, W_ST, n_genes)
    for i in range(3):
        xr, yr = gdat[i]
        np.testing.assert_array_equal(
            Xg[i], xr.permute(1, 2, 0).numpy(),
            err_msg=f"count grid {i} differs from the reference loader's")
        np.testing.assert_array_equal(Yg[i], yr.numpy())

    # --- convert the trained torch checkpoint; replay through our stack ---
    variables = gridnet_from_torch(
        model.state_dict(),
        f_variables=count_mlp_from_torch(model.patch_classifier.state_dict()))
    our_g = GridNet(patch_classifier=CountMLP(n_classes=n_classes),
                    n_classes=n_classes)
    y_true, y_pred, y_smax = all_fgd_predictions((Xg[:1], Yg[:1]), our_g,
                                                 variables)
    np.testing.assert_array_equal(y_true, ref_true)
    np.testing.assert_allclose(y_smax, ref_smax, rtol=1e-3, atol=1e-4)
    mism = y_pred != ref_pred
    if mism.any():
        # label flips are only acceptable at numerical near-ties
        top2 = np.sort(ref_smax[mism], axis=1)
        assert np.all(top2[:, -1] - top2[:, -2] < 1e-3), \
            "label disagreement beyond near-tie tolerance"
        assert mism.mean() < 0.005
    # f-only branch (utils.py:33-36): pins the converted f through the
    # reference's own patch_predictions path too
    _, _, y_smax_f = all_fgd_predictions((Xg[:1], Yg[:1]), our_g, variables,
                                         f_only=True)
    np.testing.assert_allclose(y_smax_f, ref_smax_f, rtol=1e-3, atol=1e-4)


def test_reference_pipeline_replay_image(ref_modules, tmp_path):
    """Image-modality whole-stack replay, mirroring the count test above:
    the reference's factory EXTRACTS the patch caches (save_visium_patches
    naming contract) and trains the Cartesian GridNet over its own torch
    DenseNet f; our factory consumes the identical JPEG caches, the trained
    checkpoint converts (densenet_from_torch + gridnet_from_torch), and our
    pipeline reproduces the reference's label maps on the same files."""
    vd, gm, tr, ut = ref_modules
    from torch.utils.data import DataLoader

    from gridnext_tpu.compat import densenet_from_torch, gridnet_from_torch
    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import DenseNet, GridNet

    sys.path.insert(0, "/root/reference")
    from gridnext.densenet import DenseNet as TorchDenseNet

    patch = 16
    sims = [simulate_spaceranger_dir(tmp_path / f"array{i}", seed=200 + i,
                                     n_genes=6, n_classes=3, image=True,
                                     spot_spacing_px=patch)
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    images = [s["image_file"] for s in sims]

    # sanity-pin the ToTensor shim against torchvision's documented math
    from torchvision.transforms import ToTensor
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    tt = ToTensor()(px)
    assert tt.shape == (3, 2, 2)
    np.testing.assert_allclose(tt.numpy(),
                               px.transpose(2, 0, 1).astype(np.float32) / 255)

    # --- reference ETL: factory EXTRACTS the patch caches ------------------
    gdat = vd.create_visium_dataset(dirs, annot_files=annots,
                                    use_count=False, use_image=True,
                                    spatial=True, patch_size_px=patch,
                                    fullres_image_files=images)
    x0, y0 = gdat[0]
    n_classes = len(gdat.classes)
    assert x0.shape == (H_ST, W_ST, 3, patch, patch)

    # --- reference training loop over the Cartesian GridNet ---------------
    torch.manual_seed(0)
    f_torch = TorchDenseNet(growth_rate=4, block_config=(2, 2),
                            compression=0.5, num_init_features=8, bn_size=4,
                            drop_rate=0, num_classes=n_classes,
                            small_inputs=True, efficient=False)
    model = gm.GridNet(f_torch, (3, patch, patch), (H_ST, W_ST),
                       n_classes=n_classes, use_bn=True)
    loaders = {
        "train": DataLoader(torch.utils.data.Subset(gdat, [1]),
                            batch_size=1, shuffle=True),
        "val": DataLoader(torch.utils.data.Subset(gdat, [0]), batch_size=1),
    }
    g_opt = torch.optim.Adam(model.corrector.parameters(), lr=1e-2)
    f_opt = torch.optim.Adam(model.patch_classifier.parameters(), lr=1e-3)
    model, _, _ = tr.train_gridwise(model, loaders,
                                    torch.nn.CrossEntropyLoss(), g_opt,
                                    num_epochs=2, f_opt=f_opt)
    ref_true, ref_pred, ref_smax = ut.all_fgd_predictions(loaders["val"],
                                                          model)

    # --- our ETL on the SAME files: consumes the reference's JPEG caches --
    cache_dirs = [os.path.join(d, f"{os.path.basename(d)}_patches{patch}px")
                  for d in dirs]
    assert all(os.path.isdir(c) for c in cache_dirs)
    sig = [sorted(os.listdir(c))[:3] for c in cache_dirs]
    mtimes = [os.path.getmtime(os.path.join(c, f))
              for c, fs in zip(cache_dirs, sig) for f in fs]
    ours = create_visium_dataset(dirs, annot_files=annots, use_count=False,
                                 use_image=True, spatial=True,
                                 patch_size_px=patch,
                                 fullres_image_files=images)
    assert [os.path.getmtime(os.path.join(c, f))
            for c, fs in zip(cache_dirs, sig) for f in fs] == mtimes, \
        "our factory must reuse the reference-extracted patch caches"
    assert list(ours.classes) == list(gdat.classes)
    Xg, Yg = ours.materialize()
    for i in range(2):
        xr, yr = gdat[i]
        np.testing.assert_allclose(
            Xg[i], xr.permute(0, 1, 3, 4, 2).numpy(), atol=1e-6,
            err_msg=f"patch grid {i} differs from the reference loader's")
        np.testing.assert_array_equal(Yg[i], yr.numpy())

    # --- convert; replay through our stack ---------------------------------
    variables = gridnet_from_torch(
        model.state_dict(),
        f_variables=densenet_from_torch(model.patch_classifier.state_dict(),
                                        block_config=(2, 2),
                                        small_inputs=True))
    our_g = GridNet(
        patch_classifier=DenseNet(growth_rate=4, block_config=(2, 2),
                                  num_init_features=8, bn_size=4,
                                  num_classes=n_classes, small_inputs=True),
        n_classes=n_classes)
    y_true, y_pred, y_smax = all_fgd_predictions((Xg[:1], Yg[:1]), our_g,
                                                 variables)
    np.testing.assert_array_equal(y_true, ref_true)
    np.testing.assert_allclose(y_smax, ref_smax, rtol=1e-3, atol=1e-4)
    mism = y_pred != ref_pred
    if mism.any():
        top2 = np.sort(ref_smax[mism], axis=1)
        assert np.all(top2[:, -1] - top2[:, -2] < 1e-3)
        assert mism.mean() < 0.005
