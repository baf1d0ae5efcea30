"""The driver entry points must stay runnable: entry() lowers, dryrun runs.

dryrun_multichip(8) takes the in-process path here (conftest provisions the
virtual 8-device CPU mesh); the subprocess respawn path is exercised when the
ambient environment pins JAX to fewer devices (the driver's axon env).
"""

import jax
import pytest

import __graft_entry__


def test_entry_lowers():
    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)  # type-checks the full graph, no compile
    assert lowered is not None


@pytest.mark.slow
def test_dryrun_multichip_in_process(capsys):
    assert len(jax.devices()) >= 8
    __graft_entry__.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "step ok" in out and "'spot': 2" in out
