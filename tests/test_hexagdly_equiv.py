"""hexagdly numerical equivalence: the independent oracle for the hex stencil.

The in-package hexconv tests compare against a brute force that shares
``geometry.HEX_TAPS_R1``, so they prove only self-consistency. Here the
oracle is ``compat.hexagdly_ref`` (odd-q semantics pinned from the geometry
the reference itself documents, hexagdly_tools.py:68), reached through the
reference's *literal* torch rot90/flip pair (gridnet_models.py:178-186).
A tap-table or parity error anywhere would break these.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from gridnext_tpu.compat.hexagdly_ref import (hexagdly_conv2d_k1,
                                              hexagdly_conv2d_k2)
from gridnext_tpu.compat.torch_convert import (
    count_mlp_from_torch, gridnethex_from_torch, hex_kernel_from_hexagdly,
    hex_kernel_from_hexagdly_k2)
from gridnext_tpu.ops.hexconv import hex_conv


def _to_oddq(x_nchw: torch.Tensor) -> torch.Tensor:
    """Odd-right -> hexagdly odd-down, exactly as gridnet_models.py:178-179."""
    return torch.flip(torch.rot90(x_nchw, 1, [3, 2]), [3])


def _from_oddq(y_nchw: torch.Tensor) -> torch.Tensor:
    """Inverse pair, exactly as gridnet_models.py:184-186."""
    return torch.rot90(torch.flip(y_nchw, [3]), 1, [2, 3])


def test_reference_rotflip_pair_is_spatial_transpose():
    x = torch.arange(2 * 3 * 5 * 4, dtype=torch.float32).reshape(2, 3, 5, 4)
    fwd = _to_oddq(x)
    assert torch.equal(fwd, x.transpose(2, 3))
    assert torch.equal(_from_oddq(fwd), x)


def _rand_hexagdly_conv(rng, ci, co):
    k0 = rng.normal(size=(co, ci, 3, 1)).astype(np.float32)
    k1 = rng.normal(size=(co, ci, 2, 2)).astype(np.float32)
    b = rng.normal(size=(co,)).astype(np.float32)
    return k0, k1, b


@pytest.mark.parametrize("h,w", [(9, 7), (8, 6), (78, 64)])
def test_hexconv_matches_hexagdly_through_rotflip(h, w):
    rng = np.random.default_rng(42)
    b, ci, co = 2, 3, 4
    x = rng.normal(size=(b, ci, h, w)).astype(np.float32)  # odd-right NCHW
    k0, k1, bias = _rand_hexagdly_conv(rng, ci, co)

    xq = _to_oddq(torch.from_numpy(x)).numpy()
    yq = hexagdly_conv2d_k1(xq, k0, k1, bias)
    y_ref = _from_oddq(torch.from_numpy(yq)).numpy()  # odd-right NCHW

    kern = hex_kernel_from_hexagdly(k0, k1)
    y = hex_conv(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                 jnp.asarray(kern), jnp.asarray(bias))
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(y_ref, (0, 2, 3, 1)), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,w", [(9, 7), (12, 10)])
def test_hexconv_radius2_matches_hexagdly_through_rotflip(h, w):
    """hex_taps(radius=2) against the INDEPENDENT size-2 oracle.

    The in-package radius-2 tests brute-force from the same hex_taps table
    (self-consistency only); this pins the 19-tap stencil to hexagdly
    kernel_size=2 geometry derived first-principles from cube-coordinate
    distances, through the reference's literal rot90/flip pair."""
    rng = np.random.default_rng(7)
    b, ci, co = 2, 3, 4
    x = rng.normal(size=(b, ci, h, w)).astype(np.float32)  # odd-right NCHW
    k0 = rng.normal(size=(co, ci, 5, 1)).astype(np.float32)
    k1 = rng.normal(size=(co, ci, 4, 2)).astype(np.float32)
    k2 = rng.normal(size=(co, ci, 3, 2)).astype(np.float32)
    bias = rng.normal(size=(co,)).astype(np.float32)

    xq = _to_oddq(torch.from_numpy(x)).numpy()
    yq = hexagdly_conv2d_k2(xq, k0, k1, k2, bias)
    y_ref = _from_oddq(torch.from_numpy(yq)).numpy()

    kern = hex_kernel_from_hexagdly_k2(k0, k1, k2)
    y = hex_conv(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                 jnp.asarray(kern), jnp.asarray(bias), radius=2)
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(y_ref, (0, 2, 3, 1)), rtol=1e-5, atol=1e-5)


def _bn_eval(x_nchw, sd, prefix, eps=1e-5):
    g = sd[prefix + ".weight"].reshape(1, -1, 1, 1)
    b = sd[prefix + ".bias"].reshape(1, -1, 1, 1)
    m = sd[prefix + ".running_mean"].reshape(1, -1, 1, 1)
    v = sd[prefix + ".running_var"].reshape(1, -1, 1, 1)
    return (x_nchw - m) / np.sqrt(v + eps) * g + b


def _rand_corrector_sd(rng, f_dim, width, n_classes):
    """Random weights under the reference GridNetHex corrector's names."""
    sd = {}
    dims = [(f_dim, width), (width, width), (width, width), (width, width),
            (width, n_classes)]
    for mi, (i_, o_) in zip((0, 1, 4, 5, 8), dims):
        k0, k1, b = _rand_hexagdly_conv(rng, i_, o_)
        sd[f"corrector.{mi}.kernel0"] = k0
        sd[f"corrector.{mi}.kernel1"] = k1
        sd[f"corrector.{mi}.bias"] = b
    for mi in (2, 6):
        sd[f"corrector.{mi}.weight"] = rng.normal(size=width).astype(np.float32)
        sd[f"corrector.{mi}.bias"] = rng.normal(size=width).astype(np.float32)
        sd[f"corrector.{mi}.running_mean"] = rng.normal(size=width).astype(np.float32)
        sd[f"corrector.{mi}.running_var"] = rng.uniform(
            0.5, 2.0, size=width).astype(np.float32)
    return sd


def _reference_corrector_forward(x_oddr_nchw, sd):
    """Emulate GridNetHexOddr's corrector pass: rot/flip + Sequential + back."""
    h = _to_oddq(torch.from_numpy(x_oddr_nchw)).numpy()
    h = hexagdly_conv2d_k1(h, sd["corrector.0.kernel0"],
                           sd["corrector.0.kernel1"], sd["corrector.0.bias"])
    h = hexagdly_conv2d_k1(h, sd["corrector.1.kernel0"],
                           sd["corrector.1.kernel1"], sd["corrector.1.bias"])
    h = np.maximum(_bn_eval(h, sd, "corrector.2"), 0.0)
    h = hexagdly_conv2d_k1(h, sd["corrector.4.kernel0"],
                           sd["corrector.4.kernel1"], sd["corrector.4.bias"])
    h = hexagdly_conv2d_k1(h, sd["corrector.5.kernel0"],
                           sd["corrector.5.kernel1"], sd["corrector.5.bias"])
    h = np.maximum(_bn_eval(h, sd, "corrector.6"), 0.0)
    h = hexagdly_conv2d_k1(h, sd["corrector.8.kernel0"],
                           sd["corrector.8.kernel1"], sd["corrector.8.bias"])
    return _from_oddq(torch.from_numpy(h)).numpy()


def test_gridnethex_corrector_roundtrip():
    """A trained-style corrector state_dict converts to identical logits."""
    from gridnext_tpu.models.gridnet import _HexCorrector

    rng = np.random.default_rng(7)
    f_dim, width, n_classes, h, w = 5, 8, 4, 10, 9
    sd = _rand_corrector_sd(rng, f_dim, width, n_classes)
    x = rng.normal(size=(2, f_dim, h, w)).astype(np.float32)

    y_ref = _reference_corrector_forward(x, sd)

    variables = gridnethex_from_torch(sd, f_variables={"params": {}})
    corr_vars = {"params": variables["params"]["corrector"],
                 "batch_stats": variables["batch_stats"]["corrector"]}
    corr = _HexCorrector(n_classes=n_classes, width=width)
    y = corr.apply(corr_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                   train=False)
    np.testing.assert_allclose(  # fp32 accumulation-order noise through 5 convs
        np.asarray(y), np.transpose(y_ref, (0, 2, 3, 1)), rtol=1e-3, atol=1e-3)


def test_gridnethex_full_model_from_torch():
    """End to end: torch count-MLP f + hexagdly corrector -> our GridNetHex."""
    from gridnext_tpu.models import CountMLP, GridNetHex

    torch.manual_seed(0)
    rng = np.random.default_rng(3)
    # width=32: GridNetHex hardwires the reference's corrector width
    # (gridnet_models.py:130-147)
    n_genes, n_classes, width, h, w = 12, 4, 32, 8, 6

    f_torch = torch.nn.Sequential(
        torch.nn.Linear(n_genes, 500), torch.nn.Linear(500, 100),
        torch.nn.BatchNorm1d(100), torch.nn.ReLU(),
        torch.nn.Linear(100, 100), torch.nn.Linear(100, 50),
        torch.nn.BatchNorm1d(50), torch.nn.ReLU(),
        torch.nn.Linear(50, n_classes),
    ).eval()

    sd = _rand_corrector_sd(rng, n_classes, width, n_classes)
    x = rng.normal(size=(1, h, w, n_genes)).astype(np.float32)

    with torch.no_grad():
        f_out = f_torch(torch.from_numpy(x.reshape(-1, n_genes))).numpy()
    ppred = f_out.reshape(1, h, w, n_classes).transpose(0, 3, 1, 2)
    y_ref = _reference_corrector_forward(np.ascontiguousarray(ppred), sd)

    f_vars = count_mlp_from_torch(f_torch.state_dict())
    variables = gridnethex_from_torch(sd, f_variables=f_vars)
    model = GridNetHex(patch_classifier=CountMLP(n_classes=n_classes),
                       n_classes=n_classes)
    y = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(y_ref, (0, 2, 3, 1)), rtol=1e-3, atol=1e-3)


def test_gridnethexmm_full_model_from_torch():
    """End to end multimodal: torch DenseNet image-f + count-MLP f + the
    shared hexagdly corrector -> our GridNetHexMM, identical logits.

    The reference concatenates count-first (gridnet_models.py:235) and the
    corrector consumes 2*n_classes channels; a converted trained MM
    checkpoint must reproduce that exactly."""
    import sys

    from gridnext_tpu.compat.torch_convert import (densenet_from_torch,
                                                   gridnethexmm_from_torch)
    from gridnext_tpu.models import CountMLP, DenseNet, GridNetHexMM

    sys.path.insert(0, "/root/reference")
    from gridnext.densenet import DenseNet as TorchDenseNet

    torch.manual_seed(1)
    rng = np.random.default_rng(11)
    n_genes, n_classes, width, h, w, p = 10, 3, 32, 6, 5, 16

    f_img_torch = TorchDenseNet(growth_rate=4, block_config=(2, 2),
                                compression=0.5, num_init_features=8,
                                bn_size=4, drop_rate=0,
                                num_classes=n_classes, small_inputs=True,
                                efficient=False).eval()
    f_cnt_torch = torch.nn.Sequential(
        torch.nn.Linear(n_genes, 500), torch.nn.Linear(500, 100),
        torch.nn.BatchNorm1d(100), torch.nn.ReLU(),
        torch.nn.Linear(100, 100), torch.nn.Linear(100, 50),
        torch.nn.BatchNorm1d(50), torch.nn.ReLU(),
        torch.nn.Linear(50, n_classes),
    ).eval()

    sd = _rand_corrector_sd(rng, 2 * n_classes, width, n_classes)
    x_img = rng.normal(size=(1, h, w, p, p, 3)).astype(np.float32)
    x_cnt = rng.normal(size=(1, h, w, n_genes)).astype(np.float32)

    # reference forward: per-modality f over flattened spots, concat
    # count-first, rot/flip + hexagdly corrector + inverse
    with torch.no_grad():
        fo_cnt = f_cnt_torch(
            torch.from_numpy(x_cnt.reshape(-1, n_genes))).numpy()
        img_flat = x_img.reshape(-1, p, p, 3).transpose(0, 3, 1, 2)
        fo_img = f_img_torch(torch.from_numpy(
            np.ascontiguousarray(img_flat))).numpy()
    ppred = np.concatenate([fo_cnt, fo_img], axis=1)
    ppred = ppred.reshape(1, h, w, 2 * n_classes).transpose(0, 3, 1, 2)
    y_ref = _reference_corrector_forward(np.ascontiguousarray(ppred), sd)

    variables = gridnethexmm_from_torch(
        sd,
        image_f_variables=densenet_from_torch(
            f_img_torch.state_dict(), block_config=(2, 2), small_inputs=True),
        count_f_variables=count_mlp_from_torch(f_cnt_torch.state_dict()))
    model = GridNetHexMM(
        image_classifier=DenseNet(growth_rate=4, block_config=(2, 2),
                                  num_init_features=8, bn_size=4,
                                  num_classes=n_classes, small_inputs=True),
        count_classifier=CountMLP(n_classes=n_classes),
        n_classes=n_classes)
    y = model.apply(variables, (jnp.asarray(x_img), jnp.asarray(x_cnt)),
                    train=False)
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(y_ref, (0, 2, 3, 1)), rtol=1e-3, atol=1e-3)
