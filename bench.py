"""Benchmark: dbMNIST conv IVAE + AR-DAE joint-step throughput on one chip.

The exact "implicit conv" configuration of the reference's canonical script
(run_vae_dbmnist.sh): mnist-conv (z=32, noise=100, softplus) + mlp-grad cdae
(h=256, 5 layers, softplus), ctx lt0, bs=128, nz_cdae=625, nz_model=1,
delta=0.1, std-scale=10000, adam(m)/rmsprop(d), dynamic binarization.

One "step" = one full joint iteration (cdae phase over 128x625 latent rows +
model phase + both optimizer updates + on-device dynamic binarization of the
two fresh batches), matching ivae_ardae.py:707-846.

Baseline: the same two-phase step executed by the reference implementation
(torch 2.x) on this host's CPU — the only hardware the reference can run on
here; no GPU exists in this environment and the repo publishes no numbers
(BASELINE.md). Measured via a minimal harness importing the reference's own
models (see BASELINE.md "measured baselines" for the methodology).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the scanned joint step takes minutes to
# compile through the axon tunnel on first use; later runs start instantly.
os.makedirs(os.path.expanduser("~/.cache/ardae_jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/ardae_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# reference torch-CPU steps/sec for the identical config, measured on this
# host (see BASELINE.md); override with ARDAE_BASELINE_STEPS_PER_SEC.
REFERENCE_STEPS_PER_SEC = float(os.environ.get("ARDAE_BASELINE_STEPS_PER_SEC", "0.00664"))

CHUNK = 20
WARM_CHUNKS = 1
TIMED_CHUNKS = 3


def main():
    from ardae_tpu.models.registry import build_cdae, build_ivae_model, context_dim_for
    from ardae_tpu.train.optim import build_optimizer
    from ardae_tpu.train.state import create_train_state
    from ardae_tpu.train.step import StepConfig, build_train_chunk

    bs, nz_cdae, z_dim, n_dim = 128, 625, 32, 100
    key = jax.random.PRNGKey(0)

    model = build_ivae_model("mnist-conv", nchannels=1, nheight=28,
                             z_dim=z_dim, n_dim=n_dim, nonlin="softplus")
    ctx_dim = context_dim_for("lt0", model_name="mnist-conv", nchannels=1,
                              nheight=28, z_dim=z_dim, h_dim=0)
    cdae = build_cdae("mlp-grad", input_dim=z_dim, context_dim=ctx_dim,
                      h_dim=256, n_layers=5, nonlin="softplus")

    params_model = model.init(key, jnp.zeros((bs, 784)), jnp.zeros((bs, n_dim)))
    params_cdae = cdae.init(key, jnp.zeros((4, z_dim)), jnp.zeros((4, ctx_dim)),
                            jnp.zeros((4, 1)))
    # bf16 compute in BOTH phases (fp32 master params + loss reductions):
    # 1.7x on the grad-style DSM loss, training quality validated equivalent
    # to fp32 at full canonical scale (VALIDATION.md / test suite)
    cfg = StepConfig(std_scale=10000.0, delta=0.1, num_cdae_updates=1,
                     train_nz_cdae=nz_cdae, train_nz_model=1, ctx_type="lt0",
                     cdae_compute_dtype="bfloat16",
                     model_compute_dtype="bfloat16")
    opt_m = build_optimizer("adam", 1e-4, beta1=0.5)
    opt_d = build_optimizer("rmsprop", 1e-4, momentum=0.5)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d)
    chunk = build_train_chunk(model, cdae, opt_m, opt_d, cfg)

    # synthetic gray MNIST-shaped training set resident in HBM
    data = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (55000, 784), jnp.float32)
    )

    def make_indices(k):
        ks = jax.random.split(k, 2)
        c_idx = jax.random.randint(ks[0], (CHUNK, cfg.num_cdae_updates, bs), 0, 55000)
        m_idx = jax.random.randint(ks[1], (CHUNK, bs), 0, 55000)
        return c_idx, m_idx

    # warmup/compile
    for i in range(WARM_CHUNKS):
        c_idx, m_idx = make_indices(jax.random.fold_in(key, i))
        state, metrics = chunk(state, data, c_idx, m_idx, key, 1.0, binarize=True)
    jax.device_get(metrics["model_loss"])  # hard sync

    t0 = time.perf_counter()
    for i in range(TIMED_CHUNKS):
        c_idx, m_idx = make_indices(jax.random.fold_in(key, 100 + i))
        state, metrics = chunk(state, data, c_idx, m_idx, key, 1.0, binarize=True)
    last_losses = jax.device_get(metrics["model_loss"])  # hard sync
    dt = time.perf_counter() - t0

    n_steps = TIMED_CHUNKS * CHUNK
    steps_per_sec = n_steps / dt
    last_loss = float(last_losses[-1])
    assert np.isfinite(last_loss), "bench ran to NaN"

    print(json.dumps({
        "metric": "dbMNIST conv IVAE+AR-DAE joint steps/sec/chip (bs=128, nz_cdae=625)",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
