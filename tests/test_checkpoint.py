"""Checkpoint save/restore roundtrip incl. meta (SURVEY.md 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from ardae_tpu.io.checkpoint import load_checkpoint, load_end_iter, save_checkpoint
from ardae_tpu.models.cdae import MLPGradCARDAE
from ardae_tpu.models.ivae.toy import ToyIPVAE
from ardae_tpu.train.optim import build_optimizer
from ardae_tpu.train.state import create_train_state

KEY = jax.random.PRNGKey(0)


def _make_state():
    model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=8, z_dim=2,
                     num_hidden_layers=1, enc_type="concat")
    cdae = MLPGradCARDAE(input_dim=2, context_dim=2, h_dim=8, num_hidden_layers=1)
    pm = model.init(KEY, jnp.zeros((2, 2)), jnp.zeros((2, 2)))
    pc = cdae.init(KEY, jnp.zeros((2, 2)), jnp.zeros((2, 2)), jnp.zeros((2, 1)))
    opt_m = build_optimizer("adam", 1e-3)
    opt_d = build_optimizer("rmsprop", 1e-3, momentum=0.5)
    return create_train_state(pm, opt_m, pc, opt_d)


def test_checkpoint_roundtrip(tmp_path):
    state = _make_state()
    state = state.replace(step=jnp.asarray(17, jnp.int32))
    meta = {"i_ep": 17, "epoch": 2, "batch_idx": 3,
            "train_num_iters_per_epoch": 14, "best_val_loss": -1.25}
    save_checkpoint(state, meta, str(tmp_path), "checkpoint")
    restored = load_checkpoint(state, str(tmp_path), "checkpoint")
    assert restored is not None
    state2, meta2 = restored
    assert int(state2.step) == 17
    assert meta2["i_ep"] == 17 and abs(meta2["best_val_loss"] + 1.25) < 1e-9
    a = jax.tree.leaves(state.params_model)
    b = jax.tree.leaves(state2.params_model)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # overwrite works
    save_checkpoint(state, {**meta, "i_ep": 18}, str(tmp_path), "checkpoint")
    _, meta3 = load_checkpoint(state, str(tmp_path), "checkpoint")
    assert meta3["i_ep"] == 18


def test_missing_checkpoint_returns_none(tmp_path):
    state = _make_state()
    assert load_checkpoint(state, str(tmp_path), "nope") is None


def test_crash_window_recovery(tmp_path):
    """A crash between os.rename(target, old) and os.rename(tmp, target)
    leaves only '.tmp-old'/'.tmp-save' on disk; load must recover from them
    instead of reporting 'no checkpoint' (ADVICE r2)."""
    import os

    state = _make_state()
    meta = {"i_ep": 7, "epoch": 1, "batch_idx": 7,
            "train_num_iters_per_epoch": 14, "best_val_loss": -2.5}
    save_checkpoint(state, meta, str(tmp_path), "checkpoint")
    target = os.path.join(str(tmp_path), "checkpoint")

    # simulate the crash window: live dir renamed away, new save not yet in
    os.rename(target, target + ".tmp-old")
    restored = load_checkpoint(state, str(tmp_path), "checkpoint")
    assert restored is not None and restored[1]["i_ep"] == 7

    # a finalized .tmp-save (crash after the old-dir rename in the NEXT save)
    os.rename(target + ".tmp-old", target + ".tmp-save")
    restored = load_checkpoint(state, str(tmp_path), "checkpoint")
    assert restored is not None and restored[1]["i_ep"] == 7

    # load_end_iter takes the same recovery path
    os.rename(target + ".tmp-save", target + ".tmp-old")
    assert load_end_iter(str(tmp_path), "checkpoint") == (1 - 1) * 14 + 7 - 1

    # an unreadable .tmp-save (partial write) is skipped, not fatal
    import shutil
    shutil.rmtree(target + ".tmp-old")
    os.makedirs(target + ".tmp-save")  # empty = maximally partial write
    assert load_checkpoint(state, str(tmp_path), "checkpoint") is None
    shutil.rmtree(target + ".tmp-save")

    # exact rename-window crash: BOTH temporaries exist and the finalized
    # '.tmp-save' is the NEWER save — it must win over '.tmp-old', which
    # would silently roll back one save interval (ADVICE r3)
    save_checkpoint(state, {**meta, "i_ep": 8}, str(tmp_path), "checkpoint")
    os.rename(target, target + ".newer-aside")     # stage the newer save
    save_checkpoint(state, meta, str(tmp_path), "checkpoint")
    os.rename(target, target + ".tmp-old")         # previously-live (i_ep=7)
    os.rename(target + ".newer-aside", target + ".tmp-save")  # newer (i_ep=8)
    restored = load_checkpoint(state, str(tmp_path), "checkpoint")
    assert restored is not None and restored[1]["i_ep"] == 8


def test_crash_after_finalize_prefers_newer_tmp_save(tmp_path):
    """Crash AFTER ckptr.save+wait_until_finished but BEFORE any rename:
    the live target is still on disk, one save interval STALER than the
    finalized '.tmp-save'. Recovery must compare metadata recency and keep
    the newer save instead of silently rolling back an interval (ADVICE r4).
    A PARTIAL '.tmp-save' alongside a live target must still fall back to
    the live target."""
    import os
    import shutil

    state = _make_state()
    meta = {"i_ep": 7, "epoch": 1, "batch_idx": 7,
            "train_num_iters_per_epoch": 14, "best_val_loss": -2.5}
    target = os.path.join(str(tmp_path), "checkpoint")

    # stage: live target at i_ep=7, finalized .tmp-save at i_ep=8
    save_checkpoint(state, {**meta, "i_ep": 8, "batch_idx": 8},
                    str(tmp_path), "checkpoint")
    os.rename(target, target + ".newer-aside")
    save_checkpoint(state, meta, str(tmp_path), "checkpoint")
    os.rename(target + ".newer-aside", target + ".tmp-save")
    restored = load_checkpoint(state, str(tmp_path), "checkpoint")
    assert restored is not None and restored[1]["i_ep"] == 8
    # load_end_iter takes the same path: i_ep 8 <=> batch_idx 8
    assert load_end_iter(str(tmp_path), "checkpoint") == (1 - 1) * 14 + 8 - 1

    # mid-write crash: partial .tmp-save next to a live target -> live wins
    shutil.rmtree(target + ".tmp-save")
    os.makedirs(target + ".tmp-save")  # empty = maximally partial write
    restored = load_checkpoint(state, str(tmp_path), "checkpoint")
    assert restored is not None and restored[1]["i_ep"] == 7

    # a STALER readable .tmp-save (equal-or-older metadata) never wins
    shutil.rmtree(target + ".tmp-save")
    shutil.rmtree(target)
    save_checkpoint(state, {**meta, "i_ep": 3}, str(tmp_path), "checkpoint")
    os.rename(target, target + ".older-aside")
    save_checkpoint(state, meta, str(tmp_path), "checkpoint")
    os.rename(target + ".older-aside", target + ".tmp-save")
    restored = load_checkpoint(state, str(tmp_path), "checkpoint")
    assert restored is not None and restored[1]["i_ep"] == 7


def test_weight_avg_checkpoint_loads_with_plain_skeleton(tmp_path):
    """A checkpoint saved by a --m-weight-avg run carries avg_params_model/
    avg_count leaves; loading it with a weight_avg='none' skeleton (the
    standalone eval scripts' default) must widen the skeleton instead of
    failing on the leaf-count mismatch."""
    model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=8, z_dim=2,
                     num_hidden_layers=1, enc_type="concat")
    cdae = MLPGradCARDAE(input_dim=2, context_dim=2, h_dim=8, num_hidden_layers=1)
    pm = model.init(KEY, jnp.zeros((2, 2)), jnp.zeros((2, 2)))
    pc = cdae.init(KEY, jnp.zeros((2, 2)), jnp.zeros((2, 2)), jnp.zeros((2, 1)))
    opt_m = build_optimizer("adam", 1e-3)
    opt_d = build_optimizer("rmsprop", 1e-3, momentum=0.5)
    avg_state = create_train_state(pm, opt_m, pc, opt_d, weight_avg="polyak")
    # make averaged params distinguishable from live params
    avg_state = avg_state.replace(
        avg_params_model=jax.tree.map(lambda x: x + 1.0, pm),
        avg_count=jnp.asarray(5, jnp.int32))
    meta = {"i_ep": 9, "epoch": 1, "batch_idx": 9,
            "train_num_iters_per_epoch": 14, "best_val_loss": 0.0}
    save_checkpoint(avg_state, meta, str(tmp_path), "checkpoint")

    plain = create_train_state(pm, opt_m, pc, opt_d)  # weight_avg='none'
    restored = load_checkpoint(plain, str(tmp_path), "checkpoint")
    assert restored is not None
    state2, meta2 = restored
    assert meta2["i_ep"] == 9
    assert state2.avg_params_model is not None
    assert int(state2.avg_count) == 5
    for a, b in zip(jax.tree.leaves(avg_state.avg_params_model),
                    jax.tree.leaves(state2.avg_params_model)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(pm),
                    jax.tree.leaves(state2.params_model)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plain_checkpoint_loads_with_weight_avg_skeleton(tmp_path):
    """Mirror of the widening test (VERDICT r4 item 6): a checkpoint saved
    WITHOUT averaging slots read by a skeleton built WITH them must narrow
    the skeleton (evaluate with live params) instead of falling into a
    cryptic tree.unflatten leaf-count error; a genuine structure mismatch
    (wrong model flags) must raise a clear message."""
    import pytest

    model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=8, z_dim=2,
                     num_hidden_layers=1, enc_type="concat")
    cdae = MLPGradCARDAE(input_dim=2, context_dim=2, h_dim=8, num_hidden_layers=1)
    pm = model.init(KEY, jnp.zeros((2, 2)), jnp.zeros((2, 2)))
    pc = cdae.init(KEY, jnp.zeros((2, 2)), jnp.zeros((2, 2)), jnp.zeros((2, 1)))
    opt_m = build_optimizer("adam", 1e-3)
    opt_d = build_optimizer("rmsprop", 1e-3, momentum=0.5)
    plain_state = create_train_state(pm, opt_m, pc, opt_d)
    meta = {"i_ep": 4, "epoch": 1, "batch_idx": 4,
            "train_num_iters_per_epoch": 14, "best_val_loss": 0.0}
    save_checkpoint(plain_state, meta, str(tmp_path), "checkpoint")

    avg_skel = create_train_state(pm, opt_m, pc, opt_d, weight_avg="polyak")
    restored = load_checkpoint(avg_skel, str(tmp_path), "checkpoint")
    assert restored is not None
    state2, meta2 = restored
    assert meta2["i_ep"] == 4
    assert state2.avg_params_model is None and state2.avg_count is None
    for a, b in zip(jax.tree.leaves(pm),
                    jax.tree.leaves(state2.params_model)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # genuine mismatch (different cdae depth): clear error, not unflatten spew
    cdae2 = MLPGradCARDAE(input_dim=2, context_dim=2, h_dim=8,
                          num_hidden_layers=3)
    pc2 = cdae2.init(KEY, jnp.zeros((2, 2)), jnp.zeros((2, 2)),
                     jnp.zeros((2, 1)))
    wrong = create_train_state(pm, opt_m, pc2, opt_d)
    with pytest.raises(ValueError, match="does not match the caller's state"):
        load_checkpoint(wrong, str(tmp_path), "checkpoint")


def test_load_end_iter(tmp_path):
    state = _make_state()
    meta = {"i_ep": 41, "epoch": 3, "batch_idx": 13,
            "train_num_iters_per_epoch": 14, "best_val_loss": 0.0}
    save_checkpoint(state, meta, str(tmp_path), "best-checkpoint")
    # reference formula: (epoch-1)*iters + batch_idx - 1 (utils/msc.py:98-110)
    assert load_end_iter(str(tmp_path), "best-checkpoint") == (3 - 1) * 14 + 13 - 1


def test_resume_is_bit_deterministic():
    """checkpoint -> restore -> continue == uninterrupted run, given the same
    data indices: the per-step noise is fold_in(seed, step) and step lives in
    the state, so the device-side trajectory is exactly reproducible."""
    import tempfile

    from ardae_tpu.models.ivae.toy import ToyIPVAE
    from ardae_tpu.train.step import StepConfig, build_train_step
    from ardae_tpu.train.optim import build_optimizer

    model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=8, z_dim=2,
                     num_hidden_layers=1, enc_type="concat")
    cdae_mod = MLPGradCARDAE(input_dim=2, context_dim=2, h_dim=8,
                             num_hidden_layers=1)
    pm = model.init(KEY, jnp.zeros((8, 2)), jnp.zeros((8, 2)))
    pc = cdae_mod.init(KEY, jnp.zeros((2, 2)), jnp.zeros((2, 2)),
                       jnp.zeros((2, 1)))
    opt_m = build_optimizer("adam", 1e-3)
    opt_d = build_optimizer("rmsprop", 1e-3, momentum=0.5)
    cfg = StepConfig(std_scale=10.0, delta=0.1, train_nz_cdae=4,
                     ctx_type="data")
    step = build_train_step(model, cdae_mod, opt_m, opt_d, cfg)
    key = jax.random.PRNGKey(42)
    batches = jax.random.normal(KEY, (8, 8, 2))

    def run(state, lo, hi):
        for i in range(lo, hi):
            state, _ = step(state, batches[i][None], batches[i], key, 1.0)
        return state

    s_full = run(create_train_state(pm, opt_m, pc, opt_d), 0, 8)

    with tempfile.TemporaryDirectory() as d:
        s_half = run(create_train_state(pm, opt_m, pc, opt_d), 0, 4)
        save_checkpoint(s_half, {"i_ep": 4, "epoch": 1, "batch_idx": 4,
                                 "train_num_iters_per_epoch": 8,
                                 "best_val_loss": 0.0}, d, "checkpoint")
        s_restored, meta = load_checkpoint(s_half, d, "checkpoint")
        assert meta["i_ep"] == 4
        s_resumed = run(s_restored, 4, 8)

    for a, b in zip(jax.tree.leaves(s_full.params_model),
                    jax.tree.leaves(s_resumed.params_model)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_full.params_cdae),
                    jax.tree.leaves(s_resumed.params_cdae)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
