"""AR-DAE implicit-VAE trainer CLI — flag-for-flag surface of the reference
driver (/root/reference/ivae_ardae.py:32-196), TPU-native internals:

  * the whole alternating scheme (num-cdae-updates x PHASE A + PHASE B, both
    optimizers, sigma statistics, beta annealing, dynamic binarization) runs
    as ONE jitted lax.scan chunk between logging boundaries — host work per
    dispatch is building int32 batch-index arrays;
  * IWS evaluation is the vmapped covariance-Gaussian bound (models/ivae/api);
  * checkpoints are single orbax TrainState pytrees; the per-step noise is
    fold_in(seed, step) with step in the state, so resume continues the
    exact device-side noise sequence (the reference cannot);
  * experiment naming / resume-dir / final-mode semantics match the
    reference (ivae_ardae.py:209-292) so experiment trees look identical.

Deviations (documented): one combined checkpoint file per flavor instead of
separate model/cdae files; phase-A and phase-B batches come from the same
shuffled-epoch stream but are grouped per chunk rather than strictly
interleaved pull-by-pull.
"""

import argparse
import contextlib
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="swissroll",
                   choices=["swissroll", "25gaussians", "sbmnist", "dbmnist",
                            "dbmnist-val5k"])
    p.add_argument("--model", default="mlp-concat",
                   choices=["mlp-concat", "mnist-concat", "mnist-conv",
                            "resconv", "resconvct", "resconv-res", "resconvct-res",
                            "resconv-res2", "resconvct-res2", "resconvct-res3",
                            "resconvct-res4",
                            "auxmlp", "auxmnist", "auxconv",
                            "auxresconv", "auxresconvct", "auxresconv-clip",
                            "auxresconvct-clip"])
    p.add_argument("--model-z-dim", type=int, default=2)
    p.add_argument("--model-h-dim", type=int, default=128)
    p.add_argument("--model-n-dim", type=int, default=2)
    p.add_argument("--model-n-layers", type=int, default=2)
    p.add_argument("--model-nonlin", default="relu")
    p.add_argument("--model-clip-z0-logvar", default="none", choices=["none"])
    p.add_argument("--model-clip-z-logvar", default="none", choices=["none"])
    p.add_argument("--cdae", default="mlp", choices=["mlp", "mlp-res", "mlp-grad"])
    p.add_argument("--cdae-h-dim", type=int, default=128)
    p.add_argument("--cdae-n-layers", type=int, default=2)
    p.add_argument("--cdae-nonlin", default="relu")
    p.add_argument("--cdae-ctx-type", default="data",
                   choices=["data", "lt0", "hidden1a"])
    p.add_argument("--std-scale", type=float, default=1.0)
    p.add_argument("--delta", type=float, default=1.0)
    p.add_argument("--num-cdae-updates", type=int, default=1)
    p.add_argument("--nheight", type=int, default=1)
    p.add_argument("--nchannels", type=int, default=2)
    p.add_argument("--m-lr", type=float, default=0.0001)
    p.add_argument("--d-lr", type=float, default=0.0001)
    p.add_argument("--d-lr-min", type=float, default=0.0001)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--train-batch-size", type=int, default=1024)
    p.add_argument("--eval-batch-size", type=int, default=None,
                   help="eval grouping batch (per-item bound, math-identical "
                        "for any value); default: auto throughput-tuned "
                        "(reference default 1024)")
    p.add_argument("--start-epoch", type=int, default=1)
    p.add_argument("--start-batch-idx", type=int, default=0)
    p.add_argument("--train-nz-cdae", type=int, default=1)
    p.add_argument("--train-nz-model", type=int, default=1)
    p.add_argument("--train-nstd-cdae", type=int, default=1)
    p.add_argument("--m-optimizer", default="adam",
                   choices=["sgd", "adam", "amsgrad", "rmsprop"])
    p.add_argument("--m-beta1", type=float, default=0.5)
    p.add_argument("--m-momentum", type=float, default=0.5)
    p.add_argument("--d-optimizer", default="adam",
                   choices=["sgd", "adam", "amsgrad", "rmsprop"])
    p.add_argument("--d-beta1", type=float, default=0.5)
    p.add_argument("--d-momentum", type=float, default=0.5)
    p.add_argument("--beta-init", type=float, default=1.0)
    p.add_argument("--beta-fin", type=float, default=1.0)
    p.add_argument("--beta-annealing", type=float, default=None)
    p.add_argument("--eta-init", type=float, default=0.0)
    p.add_argument("--eta-fin", type=float, default=0.0)
    p.add_argument("--eta-annealing", type=float, default=None)
    p.add_argument("--lmbd-init", type=float, default=0.0)
    p.add_argument("--lmbd-fin", type=float, default=0.0)
    p.add_argument("--lmbd-annealing", type=float, default=None)
    p.add_argument("--iws-samples", type=int, default=512)
    p.add_argument("--m-weight-avg", default="none",
                   choices=["none", "swa", "polyak"])
    p.add_argument("--m-weight-avg-start", type=int, default=1000)
    p.add_argument("--m-weight-avg-decay", type=float, default=0.998)
    p.add_argument("--train-mode", default="train", choices=["train", "final"])
    p.add_argument("--no-cuda", action="store_true", default=False)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--vis-interval", type=int, default=1000)
    p.add_argument("--eval-iws-interval", type=int, default=1000)
    p.add_argument("--ckpt-interval", type=int, default=10000)
    p.add_argument("--sav-interval", type=int, default=0)
    p.add_argument("--resume", dest="resume", action="store_true", default=True)
    p.add_argument("--no-resume", dest="resume", action="store_false")
    p.add_argument("--cache", default=None)
    p.add_argument("--experiment", default=None)
    p.add_argument("--exp-num", type=int, default=None)
    # ardae_tpu extensions (not in the reference surface)
    p.add_argument("--data-root", default="data")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--toy-train-size", type=int, default=2_000_000,
                   help="toy dataset train split size (reference: 2M)")
    p.add_argument("--max-iters", type=int, default=None,
                   help="hard iteration cap (smoke tests)")
    p.add_argument("--skip-final-test-eval", action="store_true", default=False,
                   help="TPU extension: skip the post-training test-set IWS "
                        "eval (for harness runs scored by the standalone "
                        "parity evaluators; ~30 min of CPU per run otherwise)")
    p.add_argument("--cdae-compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="mixed-precision PHASE-A DSM loss (1.7x on v5e)")
    p.add_argument("--model-compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="mixed-precision PHASE-B model update (fp32 loss math)")
    p.add_argument("--use-pallas", action="store_true", default=False,
                   help="fused Pallas DSM kernel (res-style cdae, h<=256; "
                        "the grad-style kernel exists but measured slower "
                        "than XLA and is not dispatched)")
    p.add_argument("--dp-devices", type=int, default=0,
                   help="data-parallel device count: shard batches over a "
                        "1-D jax.sharding mesh, params replicated, gradient "
                        "all-reduce inserted by XLA over ICI (0 = off)")
    p.add_argument("--sp-devices", type=int, default=0,
                   help="sample-parallel device count: shard the nz_cdae "
                        "sample axis (this workload's long-context analogue, "
                        "SURVEY.md 5) over the second axis of a 2-D "
                        "(data, sample) mesh; composes with --dp-devices "
                        "(0 = off)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of one post-warmup "
                        "chunk into this directory (tensorboard-viewable)")
    return p


def derive_experiment(opt):
    """Config-as-string experiment identity (reference ivae_ardae.py:212-262)."""
    parts = [
        "m{}-mz{}-mh{}-mn{}-mnh{}-ma{}".format(
            opt.model, opt.model_z_dim, opt.model_h_dim, opt.model_n_dim,
            opt.model_n_layers,
            "sfp" if opt.model_nonlin == "softplus" else opt.model_nonlin),
        "d{}-dh{}-dnh{}-da{}-dct{}".format(
            opt.cdae, opt.cdae_h_dim, opt.cdae_n_layers,
            "sfp" if opt.cdae_nonlin == "softplus" else opt.cdae_nonlin,
            opt.cdae_ctx_type),
        ("m{}-bt1{}".format(opt.m_optimizer, opt.m_beta1)
         if opt.m_optimizer in ("adam", "amsgrad")
         else "m{}-mt{}".format(opt.m_optimizer, opt.m_momentum)),
        "mlr{}".format(opt.m_lr),
        ("d{}-bt1{}".format(opt.d_optimizer, opt.d_beta1)
         if opt.d_optimizer in ("adam", "amsgrad")
         else "d{}-mt{}".format(opt.d_optimizer, opt.d_momentum)),
        "dlr{}".format(opt.d_lr),
        "tbs{}".format(opt.train_batch_size),
        "nd{}".format(opt.num_cdae_updates),
        "mwa{}{}".format(
            opt.m_weight_avg,
            "-was{}-wad{}".format(opt.m_weight_avg_start, opt.m_weight_avg_decay)
            if opt.m_weight_avg != "none" else ""),
        "binit{}-bfin{}-bann{:d}".format(
            opt.beta_init if opt.beta_init != opt.beta_fin else 1.0,
            opt.beta_fin,
            int(opt.beta_annealing)
            if opt.beta_annealing is not None and opt.beta_init != opt.beta_fin
            else 0),
        "ssc{}".format(opt.std_scale),
        "del{}".format(opt.delta),
        "nzc{}{}".format(
            opt.train_nz_cdae,
            "-nzs{}".format(opt.train_nstd_cdae) if opt.train_nstd_cdae > 1 else ""),
        "nzm{}".format(opt.train_nz_model),
        "{}".format(opt.exp_num if opt.exp_num else 0),
    ]
    return "-".join(parts)


def main(argv=None):
    opt = build_parser().parse_args(argv)

    import jax

    if opt.no_cuda:
        # reference semantics (ivae_ardae.py:199-200): --no-cuda selects the
        # host device. Must be set before first backend use; the env var
        # JAX_PLATFORMS is ignored under the axon preset.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ardae_tpu.cli.common import (
        EndIterError,
        IndexStream,
        chunk_until_boundary,
        enable_compile_cache,
        evaluate_iws_ivae,
        resolve_experiment_path,
    )

    enable_compile_cache()
    from ardae_tpu.core.annealing import annealing_func
    from ardae_tpu.core.energy import normal_energy_func
    from ardae_tpu.data import get_dataset
    from ardae_tpu.io.checkpoint import load_checkpoint, load_end_iter, save_checkpoint
    from ardae_tpu.io.logging import logging, make_writer
    from ardae_tpu.models.ivae import api as ivae_api
    from ardae_tpu.models.registry import (
        build_cdae,
        build_ivae_model,
        context_dim_for,
    )
    from ardae_tpu.train.optim import build_optimizer
    from ardae_tpu.train.state import create_train_state
    from ardae_tpu.train.step import StepConfig, build_train_chunk
    from ardae_tpu.utils.visualization import (
        convert_npimage_torchimage,
        get_2d_histogram_plot,
        get_grid_image,
        get_imshow_plot,
        get_prob_from_energy_func_for_vis,
        get_scatter_plot,
    )

    # preprocess (reference :198-207)
    for name in ("beta_annealing", "eta_annealing", "lmbd_annealing"):
        v = getattr(opt, name)
        if v is None or v < 1:
            setattr(opt, name, None)
    if opt.lmbd_init != 0.0 or opt.lmbd_fin != 0.0:
        raise NotImplementedError(
            "jacobian clamping (--lmbd-*) is dormant in the reference too: "
            "every model's jac_clamping_loss raises (e.g. models/ivae/conv.py:181)"
        )
    opt.best_val_loss = None

    if opt.cache is None:
        opt.cache = "experiments"
    if opt.experiment is None:
        opt.experiment = derive_experiment(opt)
    opt.path = resolve_experiment_path(opt.cache, opt.experiment, opt.resume)
    logging(str(opt), path=opt.path)
    writer = make_writer(opt.path)

    final_mode = opt.train_mode == "final"
    prefix = "final-" if final_mode else ""
    end_iter = load_end_iter(opt.path, "best-checkpoint") if final_mode else None

    # data
    toy_sizes = None
    if opt.toy_train_size != 2_000_000:
        toy_sizes = dict(train=opt.toy_train_size,
                         test=max(opt.toy_train_size // 100, 1000),
                         val=max(opt.toy_train_size // 1000, 500))
    splits = get_dataset(opt.dataset, root=opt.data_root, final_mode=final_mode,
                         toy_sizes=toy_sizes)
    info = splits["info"]
    if info.get("synthetic"):
        logging(f"dataset {opt.dataset}: SYNTHETIC surrogate (no real files "
                f"under {opt.data_root})", path=opt.path)
    elif "mnist" in opt.dataset:
        logging(f"dataset {opt.dataset}: real files from {opt.data_root}",
                path=opt.path)
    is_mnist = "mnist" in opt.dataset
    train_np = splits["train"]
    n_train = train_np.shape[0]
    bs = opt.train_batch_size
    steps_per_epoch = n_train // bs

    # model + cdae
    model = build_ivae_model(
        opt.model, nchannels=opt.nchannels, nheight=opt.nheight,
        z_dim=opt.model_z_dim, h_dim=opt.model_h_dim, n_dim=opt.model_n_dim,
        n_layers=opt.model_n_layers, nonlin=opt.model_nonlin,
        clip_z0_logvar=opt.model_clip_z0_logvar,
        clip_z_logvar=opt.model_clip_z_logvar,
    )
    ctx_dim = context_dim_for(
        opt.cdae_ctx_type, model_name=opt.model, nchannels=opt.nchannels,
        nheight=opt.nheight, z_dim=opt.model_z_dim, h_dim=opt.model_h_dim,
    )
    if opt.cdae == "mlp":
        raise NotImplementedError(
            "--cdae mlp (legacy reconstruction DAE) is registered but unused "
            "by the reference driver (ivae_ardae.py:583-608 only builds "
            "mlp-res / mlp-grad); use mlp-res or mlp-grad"
        )
    cdae = build_cdae(opt.cdae, input_dim=opt.model_z_dim, context_dim=ctx_dim,
                      h_dim=opt.cdae_h_dim, n_layers=opt.cdae_n_layers,
                      nonlin=opt.cdae_nonlin)


    key = jax.random.PRNGKey(opt.seed)
    k_init_m, k_init_d, k_train, k_eval = jax.random.split(key, 4)
    x0 = jnp.zeros((bs, opt.nchannels * opt.nheight * opt.nheight), jnp.float32)
    eps0 = ivae_api.make_eps(model, k_init_m, bs, 1)
    if model.family == "aux":
        params_model = model.init(k_init_m, x0, eps0, None)
    else:
        params_model = model.init(k_init_m, x0, eps0)
    params_cdae = cdae.init(
        k_init_d, jnp.zeros((4, opt.model_z_dim)), jnp.zeros((4, ctx_dim)),
        jnp.zeros((4, 1)),
    )
    logging(f"model params: "
            f"{sum(x.size for x in jax.tree.leaves(params_model)):,}", path=opt.path)
    logging(f"cdae params: "
            f"{sum(x.size for x in jax.tree.leaves(params_cdae)):,}", path=opt.path)

    opt_m = build_optimizer(opt.m_optimizer, opt.m_lr, beta1=opt.m_beta1,
                            momentum=opt.d_momentum)  # reference quirk: model
    # rmsprop uses d_momentum (ivae_ardae.py:554)
    opt_d = build_optimizer(opt.d_optimizer, opt.d_lr, beta1=opt.d_beta1,
                            momentum=opt.d_momentum)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d,
                               weight_avg=opt.m_weight_avg)

    cfg = StepConfig(
        std_scale=opt.std_scale, delta=opt.delta,
        num_cdae_updates=opt.num_cdae_updates,
        train_nz_cdae=opt.train_nz_cdae, train_nstd_cdae=opt.train_nstd_cdae,
        train_nz_model=opt.train_nz_model, ctx_type=opt.cdae_ctx_type,
        weight_avg=opt.m_weight_avg, weight_avg_start=opt.m_weight_avg_start,
        weight_avg_decay=opt.m_weight_avg_decay,
        cdae_compute_dtype=opt.cdae_compute_dtype,
        model_compute_dtype=opt.model_compute_dtype,
        use_pallas=opt.use_pallas,
        shard_samples=bool(opt.sp_devices and opt.sp_devices > 1),
    )

    def beta_fn(step):
        return annealing_func(opt.beta_init, opt.beta_fin, opt.beta_annealing, step)

    chunk_fn = build_train_chunk(model, cdae, opt_m, opt_d, cfg, beta_fn=beta_fn)

    # resume
    restored = load_checkpoint(state, opt.path, f"{prefix}checkpoint")
    i_ep = 0
    if restored is not None:
        state, meta = restored
        i_ep = int(meta["i_ep"])
        opt.best_val_loss = (None if float(meta["best_val_loss"]) == -np.inf
                             else float(meta["best_val_loss"]))

    data_dev = jax.device_put(jnp.asarray(train_np))
    stream = IndexStream(n_train, bs, seed=opt.seed + 1)
    binarize = bool(info.get("binarize", False))

    # data parallelism over a 1-D mesh (ardae_tpu extension; the reference
    # is single-GPU — SURVEY.md 2.8). Batch INDEX arrays are sharded on the
    # batch axis, so the device-side gather lands each shard's rows locally;
    # the replicated params make XLA psum the grads over ICI.
    mesh = None
    dp = opt.dp_devices if opt.dp_devices and opt.dp_devices > 1 else 0
    if opt.train_nz_cdae < 2:
        # parity note: sigma = delta*mean(std(z, ddof=1)) over the nz axis is
        # NaN for a single sample — the reference (torch.std unbiased,
        # ivae_ardae.py:754) NaNs identically at ITS default; every canonical
        # config passes nz >= 64. Warn up front instead of a silent NaN halt.
        logging("| warning: --train-nz-cdae < 2 makes the per-item sigma "
                "estimate (sample std over nz) NaN — training will halt at "
                "the first log interval. The reference behaves the same; "
                "use --train-nz-cdae >= 2.", path=opt.path)
    sp = opt.sp_devices if opt.sp_devices and opt.sp_devices > 1 else 0
    if dp or sp:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ardae_tpu.parallel.mesh import make_mesh, sample_parallel_mesh
        from ardae_tpu.parallel.mesh import replicated as replicated_sharding

        n_dp = dp or 1
        if bs % n_dp:
            raise SystemExit(
                f"--train-batch-size {bs} not divisible by "
                f"--dp-devices {opt.dp_devices}")
        if sp and opt.train_nz_cdae % sp:
            raise SystemExit(
                f"--train-nz-cdae {opt.train_nz_cdae} not divisible by "
                f"--sp-devices {sp}")
        if len(jax.devices()) < n_dp * (sp or 1):
            raise SystemExit(
                f"mesh needs {n_dp * (sp or 1)} devices but only "
                f"{len(jax.devices())} are available")
        if sp:
            # 2-D (data, sample): batch rows over "data", the nz_cdae sample
            # axis over "sample" (constraints inside train/step.py)
            mesh = sample_parallel_mesh(n_dp, sp)
        else:
            mesh = make_mesh(n_dp)
        repl = replicated_sharding(mesh)
        state = jax.device_put(state, repl)
        data_dev = jax.device_put(data_dev, repl)
        cidx_sharding = NamedSharding(mesh, P(None, None, "data"))
        midx_sharding = NamedSharding(mesh, P(None, "data"))
        logging(f"{'(data, sample)' if sp else 'data-parallel'} mesh over "
                f"{n_dp * (sp or 1)} {jax.devices()[0].platform} devices"
                + (f" (dp={n_dp}, sp={sp})" if sp else ""), path=opt.path)

    eval_params = lambda s: (s.avg_params_model
                             if opt.m_weight_avg != "none" else s.params_model)
    jitter = 1e-5 if model.family == "aux" else 0.0

    # ground-truth latent heatmap (reference :539-544)
    _prob = get_prob_from_energy_func_for_vis(normal_energy_func, num=256)
    _gtlatent = get_imshow_plot(_prob, val=6 if is_mnist else 4)

    def ckpt_meta():
        return {
            "i_ep": i_ep,
            "epoch": i_ep // steps_per_epoch + 1,
            "batch_idx": i_ep % steps_per_epoch,
            "train_num_iters_per_epoch": steps_per_epoch,
            "best_val_loss": (opt.best_val_loss if opt.best_val_loss is not None
                              else -np.inf),
        }

    def visualize(state, i_ep):
        """Full reference panel set (ivae_ardae.py:953-1114): logvar-qz
        scalars/histograms (+ per-item histograms — the reference's second
        ``.format(ii)`` is a no-op so both items land on one tag; here they
        get item-indexed tags), latent scatter/heatmap, the gt|latent and
        gt|latent|std{08,05,01,0} composites, and data-recon-gen panels
        (scatter+heatmap for toy; sampled + mean grids for mnist)."""
        params = eval_params(state)
        mode = opt.train_mode
        kv = jax.random.fold_in(k_eval, i_ep)
        n_vis = min(20000, n_train)
        xs = jnp.asarray(train_np[:n_vis])
        if binarize:
            xs = jax.random.bernoulli(jax.random.fold_in(kv, 1), xs).astype(jnp.float32)
        lat = {}
        for s_lbl, s_val in [("", None), ("08", 0.8), ("05", 0.5),
                             ("01", 0.1), ("0", 0.0)]:
            z = ivae_api.sample_latents(model, params, jax.random.fold_in(kv, 2),
                                        xs[:4096], 1, noise_std=s_val)
            lat[s_lbl] = np.asarray(z).reshape(-1, opt.model_z_dim)
        logvar_qz = np.log(np.var(np.asarray(
            ivae_api.sample_latents(model, params, kv, xs[:256], 64)
        ), axis=1) + 1e-10)
        writer.add_scalar(f"{mode}/enc/logvar_qz/mean/step",
                          float(logvar_qz.mean()), i_ep)
        writer.add_scalar(f"{mode}/enc/logvar_qz/median/step",
                          float(np.median(logvar_qz)), i_ep)
        writer.add_histogram(f"{mode}/enc/logvar_qz/hist/step",
                             logvar_qz.reshape(-1), i_ep)
        for ii in range(min(2, logvar_qz.shape[0])):
            writer.add_histogram(f"train{mode}/enc/logvar_qz/hist/item{ii}/step",
                                 logvar_qz[ii], i_ep)

        # latent panels (reference: val=4 toy, val=6 mnist)
        val = 4 if not is_mnist else 6
        _sc = get_scatter_plot(lat[""][:, :2], xlim=val, ylim=val)
        writer.add_image(f"{mode}/latent/scatter",
                         convert_npimage_torchimage(_sc), i_ep)
        _latent = get_2d_histogram_plot(lat[""][:, :2], val=val, num=128)
        img = convert_npimage_torchimage(
            np.concatenate([_gtlatent, _latent], axis=1))
        writer.add_image(f"{mode}/gt_latent/heatmap", img, i_ep)
        writer.add_image(f"{mode}/latent/heatmap",
                         convert_npimage_torchimage(_latent), i_ep)
        _stds = [get_2d_histogram_plot(lat[s][:, :2], val=val, num=128)
                 for s in ("08", "05", "01", "0")]
        img = convert_npimage_torchimage(
            np.concatenate([_gtlatent, _latent] + _stds, axis=1))
        writer.add_image(f"{mode}/alllatent/heatmap", img, i_ep)

        if not is_mnist:
            # data / recon / gen over the vis pool (reference: val=6)
            gen, _, _ = ivae_api.generate(model, params,
                                          jax.random.fold_in(kv, 3), n_vis)
            output, _, _ = ivae_api.reconstruct(model, params,
                                                jax.random.fold_in(kv, 4), xs)
            data_np, out_np, gen_np = (np.asarray(xs), np.asarray(output),
                                       np.asarray(gen))
            _d = get_scatter_plot(data_np, xlim=6, ylim=6)
            _o = get_scatter_plot(out_np, xlim=6, ylim=6)
            _g = get_scatter_plot(gen_np, xlim=6, ylim=6)
            img = convert_npimage_torchimage(np.concatenate([_d, _o, _g], axis=1))
            writer.add_image(f"{mode}/data-recon-gen/scatter", img, i_ep)
            _d = get_2d_histogram_plot(data_np, val=6, num=128)
            _o = get_2d_histogram_plot(out_np, val=6, num=128)
            _g = get_2d_histogram_plot(gen_np, val=6, num=128)
            img = convert_npimage_torchimage(np.concatenate([_d, _o, _g], axis=1))
            writer.add_image(f"{mode}/data-recon-gen/heatmap", img, i_ep)
            # reference hardcodes this tag regardless of train_mode (:1027)
            writer.add_image("train/gen/heatmap",
                             convert_npimage_torchimage(_g), i_ep)
        else:
            n_grid = min(bs, xs.shape[0])
            output, omu, _ = ivae_api.reconstruct(
                model, params, jax.random.fold_in(kv, 4), xs[:n_grid])
            gen, gmu, _ = ivae_api.generate(model, params,
                                            jax.random.fold_in(kv, 3), n_grid)
            g = lambda t: get_grid_image(np.asarray(t), n_grid, opt.nchannels,
                                         opt.nheight)
            img1 = np.concatenate([g(xs[:n_grid]), g(output), g(gen)], axis=2)
            writer.add_image(f"{mode}/data-recon-gen/sample", img1, i_ep)
            img2 = np.concatenate([g(xs[:n_grid]), g(omu), g(gmu)], axis=2)
            writer.add_image(f"{mode}/data-recon-gen/mean", img2, i_ep)
        writer.flush()

    # train loop
    total_iters = opt.epochs * steps_per_epoch
    if opt.max_iters is not None:
        total_iters = min(total_iters, opt.max_iters)
    start_time = time.time()
    try:
        while i_ep < total_iters:
            if final_mode and i_ep >= end_iter:
                raise EndIterError
            k = chunk_until_boundary(
                i_ep,
                [opt.log_interval, opt.vis_interval,
                 opt.eval_iws_interval if opt.eval_iws_interval > 0 else None,
                 opt.ckpt_interval],
                end_iter=end_iter,
            )
            k = min(k, total_iters - i_ep)
            c_idx = stream.take(k * opt.num_cdae_updates).reshape(
                k, opt.num_cdae_updates, bs)
            m_idx = stream.take(k)
            profiling = (opt.profile_dir is not None
                         and i_ep > 0 and not getattr(opt, "_profiled", False))
            if profiling:
                jax.profiler.start_trace(opt.profile_dir)
            ci, mi = jnp.asarray(c_idx), jnp.asarray(m_idx)
            if mesh is not None:
                ci = jax.device_put(ci, cidx_sharding)
                mi = jax.device_put(mi, midx_sharding)
            with (mesh if mesh is not None else contextlib.nullcontext()):
                state, metrics = chunk_fn(state, data_dev, ci, mi, k_train,
                                          1.0, binarize=binarize)
            if profiling:
                jax.device_get(metrics["model_loss"])
                jax.profiler.stop_trace()
                opt._profiled = True
                logging(f"profiler trace written to {opt.profile_dir}",
                        path=opt.path)
            i_ep += k
            epoch = (i_ep - 1) // steps_per_epoch + 1
            batch_idx = (i_ep - 1) % steps_per_epoch + 1

            if i_ep % opt.log_interval == 0:
                m = {kk: float(v[-1]) for kk, v in metrics.items()}
                if not all(np.isfinite(v) for v in m.values()):
                    # failure detection the reference lacks (SURVEY.md 5):
                    # a collapsed posterior (sigma -> 0) can blow up the
                    # score net and NaN the whole state — training on NaN
                    # params is pure waste. Halt; the post-training eval
                    # below reloads the best (finite) checkpoint.
                    logging("| NaN/Inf training metrics at iter "
                            f"{i_ep} — halting training early (best "
                            "checkpoint preserved; final eval reloads it): "
                            + ", ".join(f"{kk}={vv}" for kk, vv in m.items()),
                            path=opt.path)
                    break
                beta = float(beta_fn(i_ep - 1))
                elapsed = time.time() - start_time
                logging(
                    "| iter {:d} | epoch {:3d} | {:5d}/{:5d} | ms/step {:5.2f} "
                    "| dlr {:.5f} | (eff) std {:5.3f} | (true) std {:5.3f} "
                    "| (eff) max std {:5.3f} | (eff) min std {:5.3f} "
                    "| beta {:5.3f} | loss (vae) {:5.3f} | loss (recon) {:5.3f} "
                    "| loss (prior) {:5.3f} | loss (cdae) {:5.4f} ".format(
                        i_ep, epoch, batch_idx, steps_per_epoch,
                        elapsed * 1000 / opt.log_interval, opt.d_lr,
                        m["std_eff_mean"], m["std_eff_mean"] / opt.std_scale,
                        m["std_eff_max"], m["std_eff_min"], beta,
                        m["model_loss"], m["recon_loss"], m["prior_loss"],
                        m["cdae_loss"]),
                    path=opt.path)
                mode = opt.train_mode
                writer.add_scalar(f"{mode}/model/loss/step", m["model_loss"], i_ep)
                writer.add_scalar(f"{mode}/model/recon/step", m["recon_loss"], i_ep)
                writer.add_scalar(f"{mode}/model/prior/step", m["prior_loss"], i_ep)
                writer.add_scalar(f"{mode}/model/beta/step", beta, i_ep)
                writer.add_scalar(f"{mode}/cdae/loss/step", m["cdae_loss"], i_ep)
                writer.add_scalar(f"{mode}/cdae/std/eff/mean/step",
                                  m["std_eff_mean"], i_ep)
                writer.add_scalar(f"{mode}/cdae/std/true/mean/step",
                                  m["std_eff_mean"] / opt.std_scale, i_ep)
                writer.add_scalar(f"{mode}/cdae/std/eff/max/step",
                                  m["std_eff_max"], i_ep)
                writer.add_scalar(f"{mode}/cdae/std/eff/min/step",
                                  m["std_eff_min"], i_ep)
                writer.add_scalar(f"{mode}/cdae/lr/step", opt.d_lr, i_ep)
                start_time = time.time()

            if (opt.train_mode == "train" and opt.eval_iws_interval > 0
                    and i_ep % opt.eval_iws_interval == 0):
                t0 = time.time()
                logprob = evaluate_iws_ivae(
                    model, eval_params(state), splits["val"], opt.iws_samples,
                    jax.random.fold_in(k_eval, i_ep), binarize=binarize,
                    jitter=jitter, batch=opt.eval_batch_size)
                writer.add_scalar("val/logprob/iws/step", logprob, i_ep)
                logging("-" * 89, path=opt.path)
                logging("| val       | iter {:d} | epoch {:3d} | {:5d}/{:5d} "
                        "| sec/step {:5.2f} | logprob (iws) {:.4f} ".format(
                            i_ep, epoch, batch_idx, steps_per_epoch,
                            time.time() - t0, logprob), path=opt.path)
                logging("-" * 89, path=opt.path)
                if opt.best_val_loss is None or logprob > opt.best_val_loss:
                    opt.best_val_loss = logprob
                    save_checkpoint(state, ckpt_meta(), opt.path, "best-checkpoint")

            if i_ep % opt.vis_interval == 0:
                visualize(state, i_ep)

            if opt.ckpt_interval and i_ep % opt.ckpt_interval == 0:
                save_checkpoint(state, ckpt_meta(), opt.path, f"{prefix}checkpoint")

    except KeyboardInterrupt:
        writer.flush()
        logging("-" * 89, path=opt.path)
        logging("Exiting from training early", path=opt.path)
        logging("-" * 89, path=opt.path)
        return 0
    except EndIterError:
        save_checkpoint(state, ckpt_meta(), opt.path, f"{prefix}checkpoint")
        writer.flush()
        logging("-" * 89, path=opt.path)
        logging("End of training (final)", path=opt.path)
        logging("-" * 89, path=opt.path)

    # post-training (reference :1224-1321)
    if opt.skip_final_test_eval:
        logging("| skipping final test eval (--skip-final-test-eval)",
                path=opt.path)
        writer.close()
    elif opt.dataset in ("swissroll", "25gaussians"):
        visualize(state, i_ep)
        # giant final heatmap dump (reference :1224-1260: ~1M samples, num=256)
        params = eval_params(state)
        kd = jax.random.fold_in(k_eval, 999_979)
        n_dump = min(1_000_000, n_train)
        chunks_d, chunks_o, chunks_g, chunks_l = [], [], [], []
        for lo in range(0, n_dump, 131072):
            xs = jnp.asarray(train_np[lo:lo + 131072])
            kc = jax.random.fold_in(kd, lo)
            out, _, zc = ivae_api.reconstruct(model, params,
                                              jax.random.fold_in(kc, 1), xs)
            gen, _, _ = ivae_api.generate(model, params,
                                          jax.random.fold_in(kc, 2), xs.shape[0])
            chunks_d.append(np.asarray(xs))
            chunks_o.append(np.asarray(out))
            chunks_g.append(np.asarray(gen))
            chunks_l.append(np.asarray(zc))
        data_np = np.concatenate(chunks_d)
        out_np = np.concatenate(chunks_o)
        gen_np = np.concatenate(chunks_g)
        lat_np = np.concatenate(chunks_l)
        _d = get_2d_histogram_plot(data_np, val=6, num=256)
        _o = get_2d_histogram_plot(out_np, val=6, num=256)
        _g = get_2d_histogram_plot(gen_np, val=6, num=256)
        img = convert_npimage_torchimage(np.concatenate([_d, _o, _g], axis=1))
        writer.add_image("test/data-recon-gen/heatmap", img, 0)
        _l = get_2d_histogram_plot(lat_np[:, :2], val=4, num=256)
        img = convert_npimage_torchimage(np.concatenate([_gtlatent, _l], axis=1))
        writer.add_image("test/latent/heatmap", img, 0)
        writer.close()
    else:
        flavor = f"{prefix}checkpoint" if final_mode else "best-checkpoint"
        restored = load_checkpoint(state, opt.path, flavor)
        if restored is not None:
            state, _ = restored
        else:
            # e.g. a NaN halt before the first eval cadence: no best
            # checkpoint was ever written, so the test number below reflects
            # the LIVE train state (possibly non-finite) — say so.
            logging(f"| warning: no {flavor} on disk — evaluating the live "
                    "train state instead", path=opt.path)
        t0 = time.time()
        logprob = evaluate_iws_ivae(
            model, eval_params(state), splits["test"], opt.iws_samples,
            jax.random.fold_in(k_eval, 999_983), binarize=binarize,
            jitter=jitter, batch=opt.eval_batch_size)
        writer.add_scalar("test/logprob/iws/step", logprob, 0)
        logging("-" * 89, path=opt.path)
        logging("| test       | sec/step {:5.2f} | logprob (iws) {:.4f} ".format(
            time.time() - t0, logprob), path=opt.path)
        logging("-" * 89, path=opt.path)
        writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
