"""The shared tiny training case behind the multi-host certification.

One function, imported by BOTH tests/test_multihost.py (single-process
reference run) and tests/_multihost_worker.py (each cluster process), so
the two computations are definitionally identical: a CountMLP-f GridNetHex
over a (8, 16, 8, 24) count-grid batch with deterministic data and init.
"""

import numpy as np


def REFERENCE_CASE():
    import jax
    import jax.numpy as jnp
    import optax

    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.train.loops import create_train_state, make_steps

    rng = np.random.default_rng(1234)
    x = rng.normal(size=(8, 16, 8, 24)).astype(np.float32)
    y = rng.integers(0, 6, size=(8, 16, 8)).astype(np.int64)
    f = CountMLP(n_classes=5)
    g = GridNetHex(patch_classifier=f, n_classes=5)
    # SGD, like test_parallel's numerics comparisons: adam's first step is
    # ~sign(grad)*lr, which amplifies f32 reduction-order noise
    tx = optax.sgd(1e-2)
    state = create_train_state(g, jax.random.key(0), jnp.asarray(x[:1]), tx)
    train_step, _ = make_steps(g, tx, "grid")
    return state, tx, train_step, (x, y)
