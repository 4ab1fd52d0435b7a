"""Standalone IWS evaluator for an ivae_ardae experiment checkpoint.

Rebuilds the model/cdae/optimizer state from flags (defaults = the flagship
dbMNIST resconvct-res canonical line), restores the requested checkpoint
flavor, and runs the driver's own evaluator law (cli.common.evaluate_iws_ivae
— reference ivae_ardae.py:644-673 semantics: per-eval dynamic binarization
for MNIST sets, aux jitter rule) at any --iws-samples on any split.

Built for round-4 VERDICT item 7: one measured row at the reference's
largest sample size (--iws-samples 1024, reference ivae_ardae.py:649) —
checkpoint restore is device-agnostic, so this runs on CPU when the TPU
tunnel is down (expect ~minutes/500 items for conv decoders on the 1-core
host; ~20 s/10k items on v5e by the batch-128 internal-batching math).

Usage:
  python scripts/eval_iws_checkpoint.py <experiment_dir> \
      [--flavor best-checkpoint] [--iws-samples 1024] [--split val] \
      [--n-items 500] [--dataset dbmnist-val5k] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("exp_dir")
    p.add_argument("--flavor", default="best-checkpoint")
    p.add_argument("--dataset", default="dbmnist-val5k")
    p.add_argument("--split", default="val", choices=["val", "test", "train"])
    p.add_argument("--n-items", type=int, default=0,
                   help="evaluate only the first N items (0 = whole split)")
    p.add_argument("--iws-samples", type=int, default=1024)
    p.add_argument("--eval-batch-size", type=int, default=None)
    p.add_argument("--platform", default="cpu", choices=["cpu", "axon"])
    p.add_argument("--seed", type=int, default=1)
    # model/cdae config (defaults: canonical flagship resconvct-res line)
    p.add_argument("--model", default="resconvct-res")
    p.add_argument("--nchannels", type=int, default=1)
    p.add_argument("--nheight", type=int, default=28)
    p.add_argument("--model-z-dim", type=int, default=32)
    p.add_argument("--model-h-dim", type=int, default=512)
    p.add_argument("--model-n-dim", type=int, default=100)
    p.add_argument("--model-n-layers", type=int, default=1)
    p.add_argument("--model-nonlin", default="elu")
    p.add_argument("--cdae", default="mlp-res")
    p.add_argument("--cdae-h-dim", type=int, default=512)
    p.add_argument("--cdae-n-layers", type=int, default=5)
    p.add_argument("--cdae-nonlin", default="softplus")
    p.add_argument("--cdae-ctx-type", default="lt0")
    p.add_argument("--m-optimizer", default="adam")
    p.add_argument("--m-lr", type=float, default=0.001)
    p.add_argument("--m-beta1", type=float, default=0.9)
    p.add_argument("--d-optimizer", default="rmsprop")
    p.add_argument("--d-lr", type=float, default=0.0001)
    p.add_argument("--d-momentum", type=float, default=0.9)
    opt = p.parse_args()

    import jax

    jax.config.update("jax_platforms", opt.platform)

    import jax.numpy as jnp
    import numpy as np

    from ardae_tpu.cli.common import evaluate_iws_ivae
    from ardae_tpu.data import get_dataset
    from ardae_tpu.io.checkpoint import load_checkpoint
    from ardae_tpu.models.ivae import api as ivae_api
    from ardae_tpu.models.registry import (build_cdae, build_ivae_model,
                                           context_dim_for)
    from ardae_tpu.train.optim import build_optimizer
    from ardae_tpu.train.state import create_train_state

    model = build_ivae_model(
        opt.model, nchannels=opt.nchannels, nheight=opt.nheight,
        z_dim=opt.model_z_dim, h_dim=opt.model_h_dim, n_dim=opt.model_n_dim,
        n_layers=opt.model_n_layers, nonlin=opt.model_nonlin)
    ctx_dim = context_dim_for(
        opt.cdae_ctx_type, model_name=opt.model, nchannels=opt.nchannels,
        nheight=opt.nheight, z_dim=opt.model_z_dim, h_dim=opt.model_h_dim)
    cdae = build_cdae(opt.cdae, input_dim=opt.model_z_dim, context_dim=ctx_dim,
                      h_dim=opt.cdae_h_dim, n_layers=opt.cdae_n_layers,
                      nonlin=opt.cdae_nonlin)

    key = jax.random.PRNGKey(opt.seed)
    x0 = jnp.zeros((4, opt.nchannels * opt.nheight * opt.nheight), jnp.float32)
    eps0 = ivae_api.make_eps(model, key, 4, 1)
    if model.family == "aux":
        params_model = model.init(key, x0, eps0, None)
    else:
        params_model = model.init(key, x0, eps0)
    params_cdae = cdae.init(key, jnp.zeros((4, opt.model_z_dim)),
                            jnp.zeros((4, ctx_dim)), jnp.zeros((4, 1)))
    # reference quirk: model rmsprop uses d_momentum (ivae_ardae.py:554)
    opt_m = build_optimizer(opt.m_optimizer, opt.m_lr, beta1=opt.m_beta1,
                            momentum=opt.d_momentum)
    opt_d = build_optimizer(opt.d_optimizer, opt.d_lr, momentum=opt.d_momentum)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d)
    restored = load_checkpoint(state, opt.exp_dir, opt.flavor)
    if restored is None:
        sys.exit(f"no {opt.flavor} under {opt.exp_dir}")
    state, meta = restored
    print(f"loaded {opt.flavor} at i_ep={meta['i_ep']}")
    # --m-weight-avg runs are evaluated on the averaged params (driver law)
    params_eval = (state.params_model if state.avg_params_model is None
                   else state.avg_params_model)

    splits = get_dataset(opt.dataset, root="data")
    data = np.asarray(splits[opt.split], np.float32)
    if opt.n_items:
        data = data[: opt.n_items]
    binarize = bool(splits["info"].get("binarize", False))
    jitter = 1e-5 if model.family == "aux" else 0.0

    t0 = time.time()
    lp = evaluate_iws_ivae(
        model, params_eval, data, opt.iws_samples,
        jax.random.fold_in(jax.random.PRNGKey(opt.seed + 100), 999_983),
        binarize=binarize, jitter=jitter, batch=opt.eval_batch_size)
    dt = time.time() - t0
    print(f"IWS-{opt.iws_samples} {opt.split}[{data.shape[0]}] "
          f"({opt.dataset}, {opt.model}, flavor={opt.flavor}): {lp:.4f}  "
          f"[{dt:.1f} s total, {dt / data.shape[0] * 1000:.1f} ms/item, "
          f"platform={opt.platform}]")


if __name__ == "__main__":
    main()
