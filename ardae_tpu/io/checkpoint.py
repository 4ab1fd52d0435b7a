"""Checkpoint save/restore (reference utils/msc.py:67-110 semantics).

One orbax checkpoint holds the full TrainState pytree plus host metadata
(epoch, batch_idx, best_val_loss, iters/epoch). The per-step noise sequence
is derived as fold_in(PRNGKey(--seed), step), and step lives in the saved
TrainState — so resume continues the exact same device-side noise sequence
(the reference's global torch RNG state is unrecoverable; SURVEY.md 5). The
host-side data-shuffle position restarts on resume, matching the reference's
DataLoader-iterator behavior.

Filenames (directories): "checkpoint" / "best-checkpoint" /
"final-checkpoint" — one combined TrainState per name, vs the reference's
separate {prefix}model-/cdae-checkpoint.pth.tar pairs.
"""

import os
import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(path: str, filename: str) -> str:
    return os.path.abspath(os.path.join(path, filename))


def _restore_local(ckptr, target: str):
    """Restore a checkpoint onto the CURRENT default device, ignoring the
    recorded shardings. Without this, a checkpoint saved on TPU cannot be
    read in a CPU process (orbax replays the stored device sharding and
    fails with 'Device TPU v5 lite0 was not found') — the torch reference's
    checkpoints are device-agnostic via map_location; so are ours now."""
    from jax.sharding import SingleDeviceSharding

    md = ckptr.metadata(target).item_metadata
    sh = SingleDeviceSharding(jax.devices()[0])
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh), md
    )
    return ckptr.restore(target, abstract)


def save_checkpoint(state, meta: dict, path: str, filename: str = "checkpoint"):
    """Save TrainState + metadata. Overwrites any existing checkpoint.

    The state pytree is stored as a flat leaves dict (leaf_0..leaf_N); the
    caller's live state provides the treedef at restore time, which makes
    the format robust to custom dataclass node types.
    """
    target = _ckpt_dir(path, filename)
    ckptr = ocp.StandardCheckpointer()
    leaves = jax.tree.leaves(state)
    payload = {
        "leaves": {f"leaf_{i}": v for i, v in enumerate(leaves)},
        "meta": {k: np.asarray(v) for k, v in meta.items()},
    }
    # write-new-then-swap: rmtree-ing the live checkpoint before the new
    # save finalizes would destroy the only copy if the process dies in
    # the window (the best-checkpoint is the NaN-halt recovery path)
    import shutil

    tmp = target + ".tmp-save"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr.save(tmp, payload)
    ckptr.wait_until_finished()
    old = target + ".tmp-old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(tmp, target)
    if os.path.exists(old):
        shutil.rmtree(old)


def _meta_recency(restored) -> int:
    """Completed-iteration stamp of a restored payload, for comparing which
    of two readable checkpoints is newer; -1 if metadata is malformed."""
    try:
        meta = restored["meta"]
        if "i_ep" in meta:
            return int(np.asarray(meta["i_ep"]))
        return (int(np.asarray(meta["epoch"])) - 1) * int(
            np.asarray(meta["train_num_iters_per_epoch"])
        ) + int(np.asarray(meta["batch_idx"]))
    except Exception:
        return -1


def _restore_with_recovery(target: str):
    """Restore `target`, falling back to the write-then-swap temporaries.

    save_checkpoint has a (tiny) crash window between os.rename(target, old)
    and os.rename(tmp, target) where no live directory exists but a valid
    copy survives as '.tmp-save' (the finalized NEW save — ckptr.save +
    wait_until_finished completed before any rename) or '.tmp-old'
    (previously-live, one save interval stale). Recover from those instead
    of silently reporting 'no checkpoint' (ADVICE r2). '.tmp-save' is
    preferred over '.tmp-old' (ADVICE r3: in the rename-window crash both
    exist and '.tmp-save' is newer); the unreadable-skip below handles the
    other case where '.tmp-save' is a PARTIAL write — which can only occur
    alongside a live target, or alone after a first-ever-save crash.

    When BOTH the live target and a READABLE '.tmp-save' exist (crash after
    the new save finalized but before any rename), the live target is one
    save interval staler than the finished '.tmp-save' — compare the two by
    their completed-iteration metadata and keep the newer (ADVICE r4), so
    that crash no longer silently rolls back an interval. Returns
    (restored, src) or None.
    """
    ckptr = ocp.StandardCheckpointer()
    tmp_save = target + ".tmp-save"
    if os.path.exists(target) and os.path.exists(tmp_save):
        live = _restore_local(ckptr, target)  # unreadable primary stays loud
        try:
            pending = _restore_local(ckptr, tmp_save)
        except Exception as e:
            print(f"=> recovery candidate '{tmp_save}' unreadable ({e}); "
                  "skipping")
            return live, target
        if _meta_recency(pending) > _meta_recency(live):
            print(f"=> recovered newer finalized save '{tmp_save}' over the "
                  "live checkpoint (crash between save-finalize and swap)")
            return pending, tmp_save
        return live, target
    candidates = [(target, False),
                  (target + ".tmp-save", True),
                  (target + ".tmp-old", True)]
    for cand, is_recovery in candidates:
        if not os.path.exists(cand):
            continue
        try:
            restored = _restore_local(ckptr, cand)
        except Exception as e:
            # a .tmp-save can be a partial write from the crashed save;
            # an unreadable primary should still surface loudly
            if not is_recovery:
                raise
            print(f"=> recovery candidate '{cand}' unreadable ({e}); skipping")
            continue
        if is_recovery:
            print(f"=> recovered checkpoint from interrupted save: '{cand}'")
        return restored, cand
    return None


def load_checkpoint(abstract_state, path: str, filename: str = "checkpoint"):
    """Restore (state, meta) or None if absent (reference prints and
    continues on a missing checkpoint — utils/msc.py:95-96).

    If the caller's skeleton omits the weight-averaging slots
    (``avg_params_model is None``) but the saved state carries them (a
    ``--m-weight-avg polyak/swa`` run), the skeleton is widened
    automatically — standalone evaluators don't need to know the training
    run's averaging flag in advance. The mirror mismatch (a skeleton built
    WITH averaging slots reading a run saved without them) is narrowed the
    same way; any residual leaf-count disagreement after the adjustment
    raises a clear structure-mismatch error instead of a cryptic
    tree.unflatten failure (ADVICE r4)."""
    target = _ckpt_dir(path, filename)
    rec = _restore_with_recovery(target)
    if rec is None:
        print(f"=> no checkpoint found at '{target}'")
        return None
    restored, target = rec
    leaves_dict = restored["leaves"]
    leaves = [jax.numpy.asarray(leaves_dict[f"leaf_{i}"])
              for i in range(len(leaves_dict))]
    treedef = jax.tree.structure(abstract_state)
    if treedef.num_leaves != len(leaves):
        avg = getattr(abstract_state, "avg_params_model", None)
        if avg is None and treedef.num_leaves < len(leaves):
            avg_skel = jax.tree.map(lambda x: x, abstract_state.params_model)
            abstract_state = abstract_state.replace(
                avg_params_model=avg_skel,
                avg_count=jax.numpy.zeros([], jax.numpy.int32))
            print("=> checkpoint carries averaged params; widened the skeleton")
        elif avg is not None and treedef.num_leaves > len(leaves):
            abstract_state = abstract_state.replace(
                avg_params_model=None, avg_count=None)
            print("=> checkpoint has no averaged params; narrowed the skeleton"
                  " (evaluate with the live params)")
        treedef = jax.tree.structure(abstract_state)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"checkpoint '{target}' does not match the caller's state "
                f"structure: expected {treedef.num_leaves} leaves, checkpoint "
                f"has {len(leaves)} — wrong --model/--cdae flags for this "
                "experiment?")
    state = jax.tree.unflatten(treedef, leaves)
    meta = {k: np.asarray(v).item() if np.asarray(v).ndim == 0 else np.asarray(v)
            for k, v in restored["meta"].items()}
    print(f"=> loaded checkpoint '{target}'")
    return state, meta


def load_end_iter(path: str, filename: str = "best-checkpoint") -> int:
    """Final-mode end iteration from the best checkpoint
    (reference utils/msc.py:98-110): i_ep = (epoch-1)*iters + batch_idx - 1.

    Parity quirk, replicated deliberately: the meta encodes N completed
    iterations at best-save, the -1 plus the drivers' stop-at-end_iter
    check nets a final-mode run of exactly N-1 iterations — ONE SHORT of
    the best checkpoint's count, exactly like the reference's
    `(i_ep+1) > opt.end_iter` loop break (ivae_ardae.py:698-700)."""
    target = _ckpt_dir(path, filename)
    rec = _restore_with_recovery(target)
    if rec is None:
        raise ValueError(f"=> no checkpoint found at '{target}'")
    restored, _ = rec
    meta = restored["meta"]
    i_ep = (int(meta["epoch"]) - 1) * int(meta["train_num_iters_per_epoch"]) + int(
        meta["batch_idx"]
    )
    return i_ep - 1
