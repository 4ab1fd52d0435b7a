"""Driver-contract tests: __graft_entry__.entry() must jit, and
dryrun_multichip must execute the full joint step on the 8-device mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np


def test_entry_jits_and_is_finite():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss, (recon, prior) = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(recon)) and np.isfinite(float(prior))


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # conftest provides 8 virtual CPU devices
    assert "dryrun_multichip(8): ok" in capsys.readouterr().out


@pytest.mark.slow
def test_dryrun_survives_broken_default_backend():
    """The dryrun is a pure-CPU check; it must pass even when the default
    backend (axon TPU tunnel) is broken — the round-1 MULTICHIP artifact
    failed exactly here (libtpu mismatch raised by a jax.devices() probe).
    Simulate by pinning the parent's platform to a nonexistent backend; the
    dryrun must route through its clean-subprocess path without ever
    initializing the parent's default backend."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prog = (
        "import jax, __graft_entry__ as ge\n"
        "jax.config.update('jax_platforms', 'nonexistent_backend')\n"
        "ge.dryrun_multichip(4)\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "_ARDAE_DRYRUN_CHILD")}
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", prog], cwd=repo, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(4): ok" in out.stdout
