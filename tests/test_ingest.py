"""SlideSource host-ingest pipeline (decode -> stage -> serve overlap)."""

import numpy as np
import pytest

from gridnext_tpu.ingest import SlideSource, decode_slide


@pytest.fixture(scope="module")
def slides(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ingest")
    rng = np.random.default_rng(0)
    files, arrays = [], []
    for i in range(3):
        arr = rng.integers(0, 255, (64 + 8 * i, 80, 3), dtype=np.uint8)
        p = root / f"s{i}.png"  # lossless: exact round-trip assertions
        Image.fromarray(arr).save(p)
        files.append(str(p))
        arrays.append(arr)
    return files, arrays


def test_slide_source_order_and_content(slides):
    files, arrays = slides
    src = SlideSource(files, prefetch=2)
    got = list(src)
    assert [i for i, _, _ in got] == [0, 1, 2]
    for (_, wsi, pos), want in zip(got, arrays):
        np.testing.assert_array_equal(np.asarray(wsi), want)
        assert pos is None
    assert src.bytes_decoded == sum(a.nbytes for a in arrays)
    assert src.bytes_staged == src.bytes_decoded
    t = src.timer.summary()
    assert t["decode"] > 0 and t["stage"] > 0
    tp = src.throughput()
    assert tp["decode_gb_s"] > 0 and tp["stage_gb_s"] > 0


def test_slide_source_positions_and_registrar(tmp_path):
    """Full loop: simulated cohort -> SlideSource -> SlideRegistrar."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu import geometry as G
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.models import DenseNet, GridNetHex
    from gridnext_tpu.serving import SlideRegistrar

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=8,
                                     n_classes=3, image=True,
                                     spot_spacing_px=16)
            for i in range(2)]
    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                                  patch, patch, 3)))
    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda gr: g.apply(variables, gr, train=False,
                                           method=lambda m, x, train: m.corrector(x, train=train)))

    src = SlideSource([s["image_file"] for s in sims],
                      [s["spaceranger_dir"] for s in sims])
    n = 0
    for i, wsi, pos in src:
        labels = registrar(wsi, pos)
        np.testing.assert_array_equal(labels > 0, sims[i]["label_grid"] > 0)
        n += 1
    assert n == 2


def test_slide_source_decode_error_propagates(tmp_path):
    bad = tmp_path / "nope.jpg"
    bad.write_bytes(b"not a jpeg")
    src = SlideSource([str(bad)])
    with pytest.raises(Exception):
        list(src)


def test_decode_slide_converts_rgba(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
    p = tmp_path / "rgba.png"
    Image.fromarray(arr, "RGBA").save(p)
    out = decode_slide(p)
    assert out.shape == (32, 32, 3)


def test_slide_source_pack_at_staging(tmp_path):
    """SlideSource(pack=True) -> PackedWSI items; register_slides produces
    the same labels as the raw-uint8 path (pallas extractor, interpreted)."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu import geometry as G
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.models import DenseNet, GridNetHex
    from gridnext_tpu.ops import PackedWSI
    from gridnext_tpu.serving import SlideRegistrar, register_slides

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=8,
                                     n_classes=3, image=True,
                                     spot_spacing_px=16)
            for i in range(2)]
    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                                  patch, patch, 3)))

    def build(extractor):
        return SlideRegistrar.from_gridnet(
            g, variables, patch_size=patch, normalize=None, patch_chunk=None,
            use_pallas_corrector=False, extractor=extractor,
            corrector_apply=lambda gr: g.apply(
                variables, gr, train=False,
                method=lambda m, x, train: m.corrector(x, train=train)))

    files = [s["image_file"] for s in sims]
    dirs = [s["spaceranger_dir"] for s in sims]

    src = SlideSource(files, dirs, pack=True)
    items = list(src)
    assert all(isinstance(w, PackedWSI) for _, w, _ in items)

    want = {i: build("xla")(jnp.asarray(np.asarray(
                __import__("PIL.Image", fromlist=["Image"]).open(files[i]).convert("RGB"))), p)
            for i, _, p in items}
    got = {i: lab for i, lab, _ in register_slides(
        build("pallas"), files, dirs,
        source=SlideSource(files, dirs, pack=True), slide_batch=2)}
    assert set(got) == {0, 1}
    for i in got:
        np.testing.assert_array_equal(got[i], want[i])


def test_slide_source_early_abandon_unblocks_decoder(slides):
    """A consumer that stops early (exception / break) must not leave the
    decode thread blocked on the bounded queue pinning decoded slides."""
    import threading
    import time

    files, arrays = slides
    n_decoded = []

    def counting_decode(f):
        n_decoded.append(f)
        return decode_slide(f)

    src = SlideSource(files * 4, prefetch=1, decode=counting_decode)
    it = iter(src)
    next(it)
    it.close()   # abandon mid-iteration (same path as a consumer exception)

    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name == "gnx-slide-decode" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert not any(t.name == "gnx-slide-decode" and t.is_alive()
                   for t in threading.enumerate()), \
        "decode thread still alive after consumer abandoned iteration"
    assert len(n_decoded) < len(files) * 4   # it stopped early, too

    # the source stays re-iterable after a cancelled run
    got = list(src)
    assert [i for i, _, _ in got] == list(range(len(files) * 4))


def test_slide_source_close_mid_iteration_does_not_hang(slides):
    """close() cancels the decode worker WITHOUT delivering the None
    sentinel; a consumer that keeps iterating must see the iterator end
    (stop-aware get in stage_next) rather than block forever."""
    import threading

    files, arrays = slides
    src = SlideSource(files * 4, prefetch=1)
    it = iter(src)
    next(it)
    src.close()

    got, done = [], threading.Event()

    def drain():
        for item in it:
            got.append(item)
        done.set()

    t = threading.Thread(target=drain, daemon=True)
    t.start()
    assert done.wait(timeout=10.0), \
        "iteration hung after close() instead of terminating"
    # whatever was already staged/queued may still come through, but the
    # full 12-slide run must have been cut short
    assert len(got) < len(files) * 4 - 1
