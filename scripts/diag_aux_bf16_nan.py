"""Localize the auxresconvct NaN (canonical dbMNIST config, seed 1).

Because the per-step RNG is fold_in(chunk_key, state.step) and the index
stream is a deterministic host generator, replaying from the iter-5000
checkpoint with the same chunk length (K=200) is bit-identical to the
original run; the chunk metrics come back stacked [K], so the first
non-finite step inside the failing chunk — and WHICH metric dies first —
falls out directly. After localizing, the script re-runs the failing
neighborhood step by step with magnitude dumps.

FINDINGS (2026-08-17, VALIDATION.md "NaN mechanism" section):
  - The 60k bf16 run's NaN localizes to iter 6204 with HEALTHY growing
    sigma (std_eff ~5.5, min ~3) — NOT round-1's hypothesized tiny-sigma
    underflow.
  - Losses diverge over ~4 steps (model_loss 68->135) with bounded
    params, then |z|max explodes 4.4 -> 2.2e11 in ONE step: an
    entropy-driven logvar runaway through the spm4 clamp (a FLOOR;
    logvar is unbounded above, so exp(0.5*lv) can overflow).
  - Replaying with --model-dtype float32 (phase B fp32) AND with both
    phases fp32 diverges at the SAME iter 6204 with the same signature:
    the runaway is workload-level, not a precision artifact.

Usage: python scripts/diag_aux_bf16_nan.py [--from-iter 5000]
         [--to-iter 8000] [--model-dtype float32] [--cdae-dtype float32]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EXP = ("experiments/dbmnist-v3/mauxresconvct-mz32-mh0-mn100-mnh0-maelu-"
       "dmlp-res-dh512-dnh5-dasfp-dcthidden1a-madam-bt10.9-mlr0.001-"
       "drmsprop-mt0.9-dlr0.0001-tbs128-nd2-mwanone-binit0.0001-bfin1.0-"
       "bann50000-ssc100.0-del0.1-nzc625-nzm1-77-260817-11:33:44")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-iter", type=int, default=5000)
    ap.add_argument("--to-iter", type=int, default=8000)
    ap.add_argument("--exp", default=EXP)
    ap.add_argument("--model-dtype", default="bfloat16",
                    help="model_compute_dtype for the replay (A/B vs the "
                    "original bf16 run; 'float32' answers whether the "
                    "divergence is precision-induced)")
    ap.add_argument("--cdae-dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ardae_tpu.cli.common import IndexStream, enable_compile_cache
    from ardae_tpu.core.annealing import annealing_func
    from ardae_tpu.data import get_dataset
    from ardae_tpu.io.checkpoint import load_checkpoint
    from ardae_tpu.models.ivae import api as ivae_api
    from ardae_tpu.models.registry import (build_cdae, build_ivae_model,
                                           context_dim_for)
    from ardae_tpu.train.optim import build_optimizer
    from ardae_tpu.train.state import create_train_state
    from ardae_tpu.train.step import (StepConfig, build_train_chunk,
                                      build_train_step, cdae_update,
                                      model_update)

    enable_compile_cache()

    # ---- identical setup to the 60k run (seed 1, canonical flags) ----
    SEED, BS, U, K = 1, 128, 2, 200
    splits = get_dataset("dbmnist-val5k", root="data")
    train_np = splits["train"]
    n_train = train_np.shape[0]
    binarize = bool(splits["info"].get("binarize", False))

    model = build_ivae_model("auxresconvct", nchannels=1, nheight=28,
                             z_dim=32, h_dim=0, n_dim=100, n_layers=0,
                             nonlin="elu", clip_z0_logvar="none",
                             clip_z_logvar="none")
    ctx_dim = context_dim_for("hidden1a", model_name="auxresconvct",
                              nchannels=1, nheight=28, z_dim=32, h_dim=0)
    cdae = build_cdae("mlp-res", input_dim=32, context_dim=ctx_dim,
                      h_dim=512, n_layers=5, nonlin="softplus")

    key = jax.random.PRNGKey(SEED)
    k_init_m, k_init_d, k_train, _ = jax.random.split(key, 4)
    x0 = jnp.zeros((BS, 28 * 28), jnp.float32)
    eps0 = ivae_api.make_eps(model, k_init_m, BS, 1)
    params_model = model.init(k_init_m, x0, eps0, None)
    params_cdae = cdae.init(k_init_d, jnp.zeros((4, 32)),
                            jnp.zeros((4, ctx_dim)), jnp.zeros((4, 1)))
    opt_m = build_optimizer("adam", 1e-3, beta1=0.9, momentum=0.9)
    opt_d = build_optimizer("rmsprop", 1e-4, beta1=0.9, momentum=0.9)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d,
                               weight_avg="none")
    cfg = StepConfig(std_scale=100.0, delta=0.1, num_cdae_updates=U,
                     train_nz_cdae=625, train_nstd_cdae=1, train_nz_model=1,
                     ctx_type="hidden1a", cdae_compute_dtype=args.cdae_dtype,
                     model_compute_dtype=args.model_dtype)
    print(f"replay dtypes: model={args.model_dtype} cdae={args.cdae_dtype}",
          flush=True)

    def beta_fn(step):
        return annealing_func(0.0001, 1.0, 50000.0, step)

    chunk_fn = build_train_chunk(model, cdae, opt_m, opt_d, cfg, beta_fn=beta_fn)

    restored = load_checkpoint(state, args.exp, "checkpoint")
    assert restored is not None, "checkpoint missing"
    state, meta = restored
    start = int(meta["i_ep"])
    print(f"restored iter {start} from {args.exp}", flush=True)
    assert start == args.from_iter, (start, args.from_iter)

    # fast-forward the index stream exactly like the run: chunks of 200,
    # take(k*U) then take(k)
    stream = IndexStream(n_train, BS, seed=SEED + 1)
    for _ in range(start // K):
        stream.take(K * U)
        stream.take(K)

    data_dev = jax.device_put(jnp.asarray(train_np))

    i_ep = start
    pre_chunk = None  # host copy of state before the failing chunk
    bad_step = None
    while i_ep < args.to_iter:
        snapshot = jax.device_get(state)  # chunk donates; keep a host copy
        c_idx = stream.take(K * U).reshape(K, U, BS)
        m_idx = stream.take(K)
        state, metrics = chunk_fn(state, data_dev, jnp.asarray(c_idx),
                                  jnp.asarray(m_idx), k_train, 1.0,
                                  binarize=binarize)
        m = jax.device_get(metrics)
        finite = {k: np.isfinite(v) for k, v in m.items()}
        if all(v.all() for v in finite.values()):
            print(f"iter {i_ep + K}: finite "
                  f"(cdae {m['cdae_loss'][-1]:.4f}, vae {m['model_loss'][-1]:.2f}, "
                  f"sig {m['std_eff_mean'][-1]:.3f} "
                  f"[{m['std_eff_min'][-1]:.3f},{m['std_eff_max'][-1]:.3f}])",
                  flush=True)
            i_ep += K
            continue
        firsts = {k: (int(np.argmax(~v)) if not v.all() else None)
                  for k, v in finite.items()}
        print(f"NON-FINITE inside chunk starting at iter {i_ep}:", flush=True)
        for k, f in sorted(firsts.items(), key=lambda kv: (kv[1] is None, kv[1])):
            print(f"  {k}: first bad step-offset {f}"
                  + ("" if f is None else
                     f" (iter {i_ep + f}), window "
                     + np.array2string(np.asarray(m[k])[max(0, f - 3):f + 2],
                                       precision=4)), flush=True)
        pre_chunk = snapshot
        bad_step = i_ep + min(f for f in firsts.values() if f is not None)
        break

    if pre_chunk is None:
        print(f"no NaN up to iter {args.to_iter} — trajectory survived; "
              "rerun with a larger --to-iter", flush=True)
        return

    # ---- single-step replay of the failing neighborhood with dumps ----
    print(f"\n--- single-step replay toward iter {bad_step} ---", flush=True)
    state = jax.device_put(pre_chunk)
    i = i_ep

    def tree_absmax(t):
        return max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(t))

    # NOTE: single-step is a DIFFERENT compiled program than the K=200 scan
    # (rounding can differ), so the exact NaN iter may shift by a few steps;
    # the mechanism readout is what matters.
    step_fn = build_train_step(model, cdae, opt_m, opt_d, cfg)

    # replay batches deterministically: regenerate the same index chunk
    stream2 = IndexStream(n_train, BS, seed=SEED + 1)
    for _ in range(i_ep // K):
        stream2.take(K * U)
        stream2.take(K)
    c_all = stream2.take(K * U).reshape(K, U, BS)
    m_all = stream2.take(K)

    for off in range(K):
        i = i_ep + off
        if i > bad_step + 5:
            break
        k = jax.random.fold_in(k_train, int(jax.device_get(state.step)))
        cb = jnp.take(data_dev, jnp.asarray(c_all[off].reshape(-1)),
                      axis=0).reshape(U, BS, -1)
        mb = jnp.take(data_dev, jnp.asarray(m_all[off]), axis=0)
        if binarize:
            kb1, kb2 = jax.random.split(jax.random.fold_in(k, 7))
            cb = jax.random.bernoulli(kb1, cb).astype(jnp.float32)
            mb = jax.random.bernoulli(kb2, mb).astype(jnp.float32)
        beta = beta_fn(int(jax.device_get(state.step)))

        if i >= bad_step - 5:
            # dump pre-step diagnostics in fp32 (exact) for this state
            pm, pc = state.params_model, state.params_cdae
            z = ivae_api.sample_latents(model, pm, jax.random.fold_in(k, 98),
                                        mb, 8)
            print(f"iter {i}: |params_model|max {tree_absmax(pm):.3e} "
                  f"|params_cdae|max {tree_absmax(pc):.3e} "
                  f"|z|max {float(jnp.max(jnp.abs(z))):.3e}", flush=True)

        state, metrics = step_fn(state, cb, mb, k_train, beta)
        mm = {kk: float(v) for kk, v in jax.device_get(metrics).items()}
        if i >= bad_step - 5 or not all(np.isfinite(v) for v in mm.values()):
            print(f"iter {i}->{i+1}: " + ", ".join(
                f"{kk}={vv:.4g}" for kk, vv in sorted(mm.items())), flush=True)
        if not all(np.isfinite(v) for v in mm.values()):
            print("first non-finite step in single-step replay", flush=True)
            break


if __name__ == "__main__":
    main()
