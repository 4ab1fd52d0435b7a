"""A/B: jax.checkpoint (remat) around the phase-A DSM loss, on the real TPU.

The flagship step is HBM-traffic-bound with the MXU ~97% idle (BASELINE.md
roofline), so recomputing the score net's forward during backward — instead
of storing + reloading its activations — trades idle FLOPs for the scarce
resource. This measures StepConfig.remat_cdae on/off for the primary conv
config and the flagship resconvct-res config; the winner sets the default.

Also runs a correctness check first: remat must not change the loss/grads
(jax.checkpoint is semantics-preserving).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import jax
import numpy as np


def correctness():
    import jax.numpy as jnp

    from ardae_tpu.models.registry import build_cdae, build_ivae_model
    from ardae_tpu.train.optim import build_optimizer
    from ardae_tpu.train.state import create_train_state
    from ardae_tpu.train.step import StepConfig, build_train_step

    key = jax.random.PRNGKey(0)
    model = build_ivae_model("mlp-concat", nchannels=2, nheight=1, z_dim=2,
                             h_dim=16, n_dim=4, n_layers=2, nonlin="relu")
    cdae = build_cdae("mlp-grad", input_dim=2, context_dim=2, h_dim=16,
                      n_layers=2, nonlin="softplus")
    pm = model.init(key, jnp.zeros((4, 2)), jnp.zeros((4, 4)))
    pc = cdae.init(key, jnp.zeros((4, 2)), jnp.zeros((4, 2)), jnp.zeros((4, 1)))
    om = build_optimizer("adam", 1e-4, beta1=0.5)
    od = build_optimizer("rmsprop", 1e-4, momentum=0.5)
    outs = []
    for remat in (False, True):
        cfg = StepConfig(std_scale=100.0, delta=0.1, num_cdae_updates=1,
                         train_nz_cdae=8, train_nz_model=1, ctx_type="lt0",
                         remat_cdae=remat)
        st = create_train_state(pm, om, pc, od)
        step = build_train_step(model, cdae, om, od, cfg)
        x = jax.random.uniform(key, (4, 2))
        st, m = step(st, x[None], x, key, 1.0)
        outs.append((jax.device_get(m["cdae_loss"]),
                     jax.device_get(jax.tree.leaves(st.params_cdae)[0])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)
    print("correctness: remat == no-remat (loss and updated params)")


def main():
    correctness()
    for label, kw in [
        ("primary conv", dict(model_name="mnist-conv", cdae_name="mlp-grad",
                              h_model=0, n_layers_model=0,
                              nonlin_model="softplus", h_cdae=256,
                              n_layers_cdae=5, num_cdae_updates=1,
                              std_scale=10000.0)),
        ("flagship resconvct-res", dict(model_name="resconvct-res",
                                        cdae_name="mlp-res", h_model=512,
                                        n_layers_model=1, nonlin_model="elu",
                                        h_cdae=512, n_layers_cdae=5,
                                        num_cdae_updates=2, std_scale=100.0)),
    ]:
        for remat in (False, True):
            row = B.bench_ivae(label=f"{label} remat={remat}", baseline=0,
                               extra_cfg={"remat_cdae": remat}, **kw)
            print(f"{label:26s} remat={remat}: {row['steps_per_sec']:8.2f} "
                  f"steps/s  [{row['min']:.2f}, {row['max']:.2f}]", flush=True)


if __name__ == "__main__":
    main()
