"""Driver-contract tests: __graft_entry__.entry() must jit, and
dryrun_multichip must execute the full joint step on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np


def test_entry_jits_and_is_finite():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss, (recon, prior) = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(recon)) and np.isfinite(float(prior))


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # conftest provides 8 virtual CPU devices
    assert "dryrun_multichip(8): ok" in capsys.readouterr().out
