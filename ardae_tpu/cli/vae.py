"""Baseline VAE trainer CLI — flag surface of the reference /root/reference/
vae.py:28-127, TPU-native internals (single optimizer, loss scaled by
1/(C*H*W) before the update — vae.py:410-411, IWAE eval with the exact q).
"""

import argparse
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="swissroll",
                   choices=["swissroll", "25gaussians", "sbmnist", "dbmnist",
                            "dbmnist-val5k"])
    p.add_argument("--model", default="mnist",
                   choices=["toy", "toy-maf", "mnist", "conv", "resconv",
                            "resconvct", "auxtoy", "auxmnist", "auxconv",
                            "auxresconv", "auxresconvct"])
    p.add_argument("--model-z-dim", type=int, default=8)
    p.add_argument("--model-h-dim", type=int, default=300)
    p.add_argument("--model-n-dim", type=int, default=0)
    p.add_argument("--model-n-layers", type=int, default=1)
    p.add_argument("--model-nonlin", default="softplus")
    p.add_argument("--model-clip-logvar", default="none")
    p.add_argument("--nheight", type=int, default=28)
    p.add_argument("--nchannels", type=int, default=1)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--epochs", type=int, default=32000)
    p.add_argument("--train-batch-size", type=int, default=64)
    p.add_argument("--eval-batch-size", type=int, default=None,
                   help="eval grouping batch (per-item bound, math-identical "
                        "for any value); default: auto throughput-tuned "
                        "(reference default 32)")
    p.add_argument("--optimizer", default="adam",
                   choices=["sgd", "adam", "amsgrad", "rmsprop"])
    p.add_argument("--start-epoch", type=int, default=1)
    p.add_argument("--start-batch-idx", type=int, default=0)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--momentum", type=float, default=0.5)
    p.add_argument("--beta-init", type=float, default=1.0)
    p.add_argument("--beta-fin", type=float, default=1.0)
    p.add_argument("--beta-annealing", type=float, default=None)
    p.add_argument("--iws-samples", type=int, default=512)
    p.add_argument("--weight-avg", default="none",
                   choices=["none", "swa", "polyak"])
    p.add_argument("--weight-avg-start", type=int, default=1000)
    p.add_argument("--weight-avg-decay", type=float, default=0.998)
    p.add_argument("--train-mode", default="train", choices=["train", "final"])
    p.add_argument("--no-cuda", action="store_true", default=False)
    p.add_argument("--log-interval", type=int, default=500)
    p.add_argument("--vis-interval", type=int, default=5000)
    p.add_argument("--eval-iws-interval", type=int, default=1000)
    p.add_argument("--ckpt-interval", type=int, default=10000)
    p.add_argument("--sav-interval", type=int, default=0)
    p.add_argument("--resume", dest="resume", action="store_true", default=True)
    p.add_argument("--no-resume", dest="resume", action="store_false")
    p.add_argument("--cache", default=None)
    p.add_argument("--experiment", default=None)
    p.add_argument("--exp-num", type=int, default=None)
    # ardae_tpu extensions
    p.add_argument("--data-root", default="data")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--toy-train-size", type=int, default=2_000_000)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--skip-final-test-eval", action="store_true", default=False,
                   help="TPU extension: skip the post-training test-set IWAE "
                        "eval (for harness runs scored by the standalone "
                        "parity evaluators; ~30 min of CPU per run otherwise)")
    p.add_argument("--dp-devices", type=int, default=0,
                   help="data-parallel device count over a 1-D mesh (0 = off)")
    p.add_argument("--model-compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="TPU extension: run encoder/decoder matmuls in bf16 "
                        "(fp32 master params, sampling and loss reductions)")
    return p


def derive_experiment(opt):
    """(reference vae.py:140-163)"""
    parts = [
        "vae",
        opt.dataset,
        "m{}-mz{}-mh{}-mn{}-mnh{}-ma{}-mcl{}".format(
            opt.model, opt.model_z_dim, opt.model_h_dim, opt.model_n_dim,
            opt.model_n_layers, opt.model_nonlin, opt.model_clip_logvar),
        ("{}-bt1{}".format(opt.optimizer, opt.beta1)
         if opt.optimizer in ("adam", "amsgrad")
         else "{}-mt{}".format(opt.optimizer, opt.momentum)),
        "lr{}".format(opt.lr),
        "wa{}{}".format(
            opt.weight_avg,
            "-was{}-wad{}".format(opt.weight_avg_start, opt.weight_avg_decay)
            if opt.weight_avg != "none" else ""),
        "tbs{}".format(opt.train_batch_size),
        "binit{}-bfin{}-bann{:d}".format(
            opt.beta_init, opt.beta_fin,
            int(opt.beta_annealing) if opt.beta_annealing is not None else 0),
        "exp{}".format(opt.exp_num if opt.exp_num else 0),
    ]
    return "-".join(parts)


def main(argv=None):
    opt = build_parser().parse_args(argv)

    import jax

    if opt.no_cuda:
        # reference semantics (vae.py:199-style): --no-cuda selects the host
        # device. Must be set before first backend use; the env var
        # JAX_PLATFORMS is ignored under the axon preset.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ardae_tpu.cli.common import (
        EndIterError,
        IndexStream,
        chunk_until_boundary,
        enable_compile_cache,
        evaluate_iwae_vae,
        resolve_experiment_path,
    )
    from ardae_tpu.core.annealing import annealing_func
    from ardae_tpu.data import get_dataset
    from ardae_tpu.io.checkpoint import load_checkpoint, load_end_iter, save_checkpoint
    from ardae_tpu.io.logging import logging, make_writer
    from ardae_tpu.models.registry import build_vae_model
    from ardae_tpu.core.energy import normal_energy_func
    from ardae_tpu.models.vae.api import generate as vae_generate
    from ardae_tpu.models.vae.api import reconstruct as vae_reconstruct
    from ardae_tpu.models.vae.api import vae_loss
    from ardae_tpu.models.vae.aux import aux_vae_loss
    from ardae_tpu.train.optim import build_optimizer
    from ardae_tpu.train.state import TrainState
    from ardae_tpu.train.step import StepConfig, _update_weight_avg
    from ardae_tpu.utils.visualization import (
        convert_npimage_torchimage,
        get_2d_histogram_plot,
        get_grid_image,
        get_imshow_plot,
        get_prob_from_energy_func_for_vis,
        get_scatter_plot,
    )

    enable_compile_cache()

    if opt.beta_annealing is None or opt.beta_annealing < 1:
        opt.beta_annealing = None
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
    binarize = bool(info.get("binarize", False))

    model = build_vae_model(
        opt.model, nchannels=opt.nchannels, nheight=opt.nheight,
        z_dim=opt.model_z_dim, h_dim=opt.model_h_dim, n_dim=opt.model_n_dim,
        n_layers=opt.model_n_layers, nonlin=opt.model_nonlin,
        clip_logvar=opt.model_clip_logvar,
    )
    is_aux = model.family == "aux_gaussian_posterior"
    loss_fn = aux_vae_loss if is_aux else vae_loss

    key = jax.random.PRNGKey(opt.seed)
    k_init, k_train, k_eval = jax.random.split(key, 3)
    x0 = jnp.zeros((bs, opt.nchannels * opt.nheight * opt.nheight), jnp.float32)
    params = model.init(k_init, x0)
    logging(f"model params: "
            f"{sum(x.size for x in jax.tree.leaves(params)):,}", path=opt.path)

    tx = build_optimizer(opt.optimizer, opt.lr, beta1=opt.beta1,
                         momentum=opt.momentum)
    state = TrainState(
        step=jnp.zeros([], jnp.int32), params_model=params,
        opt_model=tx.init(params), params_cdae={}, opt_cdae=(),
        avg_params_model=(jax.tree.map(jnp.array, params)
                          if opt.weight_avg != "none" else None),
        avg_count=(jnp.zeros([], jnp.int32)
                   if opt.weight_avg != "none" else None),
    )

    scale = 1.0 / float(opt.nchannels * opt.nheight * opt.nheight)
    wa_cfg = StepConfig(weight_avg=opt.weight_avg,
                        weight_avg_start=opt.weight_avg_start,
                        weight_avg_decay=opt.weight_avg_decay)

    def beta_fn(step):
        return annealing_func(opt.beta_init, opt.beta_fin, opt.beta_annealing, step)

    from functools import partial

    @partial(jax.jit, static_argnames=("binarize_flag",), donate_argnums=(0,))
    def chunk_fn(state, data, m_idx, key, binarize_flag=False):
        def body(state, idx):
            k = jax.random.fold_in(key, state.step)
            batch = jnp.take(data, idx, axis=0)
            if binarize_flag:
                batch = jax.random.bernoulli(
                    jax.random.fold_in(k, 7), batch).astype(jnp.float32)
            beta = beta_fn(state.step)

            cdt = (None if opt.model_compute_dtype == "float32"
                   else opt.model_compute_dtype)

            def loss_f(p):
                loss, terms = loss_fn(model, p, k, batch, beta=beta,
                                      compute_dtype=cdt)
                return scale * loss, terms

            (loss, terms), grads = jax.value_and_grad(loss_f, has_aux=True)(
                state.params_model)
            updates, opt_state = tx.update(grads, state.opt_model,
                                           state.params_model)
            new_params = jax.tree.map(lambda p, u: p + u, state.params_model,
                                      updates)
            state = state.replace(step=state.step + 1, params_model=new_params,
                                  opt_model=opt_state)
            state = _update_weight_avg(wa_cfg, state)
            metrics = {"loss": loss, "recon_loss": terms["recon"],
                       "kld_loss": terms["kld"]}
            return state, metrics

        return jax.lax.scan(body, state, m_idx)

    restored = load_checkpoint(state, opt.path, f"{prefix}checkpoint")
    i_ep = 0
    if restored is not None:
        state, meta = restored
        i_ep = int(meta["i_ep"])
        opt.best_val_loss = (None if float(meta["best_val_loss"]) == -np.inf
                             else float(meta["best_val_loss"]))

    data_dev = jax.device_put(jnp.asarray(train_np))
    stream = IndexStream(n_train, bs, seed=opt.seed + 1)
    eval_params = lambda s: (s.avg_params_model
                             if opt.weight_avg != "none" else s.params_model)

    # data parallelism over a 1-D mesh (see cli/ivae_ardae.py)
    mesh = None
    if opt.dp_devices and opt.dp_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ardae_tpu.parallel.mesh import make_mesh
        from ardae_tpu.parallel.mesh import replicated as replicated_sharding

        if bs % opt.dp_devices:
            raise SystemExit(
                f"--train-batch-size {bs} not divisible by "
                f"--dp-devices {opt.dp_devices}")
        if len(jax.devices()) < opt.dp_devices:
            raise SystemExit(
                f"--dp-devices {opt.dp_devices} but only "
                f"{len(jax.devices())} devices are available")
        mesh = make_mesh(opt.dp_devices)
        repl = replicated_sharding(mesh)
        state = jax.device_put(state, repl)
        data_dev = jax.device_put(data_dev, repl)
        midx_sharding = NamedSharding(mesh, P(None, "data"))
        logging(f"data-parallel mesh over {opt.dp_devices} "
                f"{jax.devices()[0].platform} devices", path=opt.path)

    def ckpt_meta():
        return {
            "i_ep": i_ep,
            "epoch": i_ep // steps_per_epoch + 1,
            "batch_idx": i_ep % steps_per_epoch,
            "train_num_iters_per_epoch": steps_per_epoch,
            "best_val_loss": (opt.best_val_loss if opt.best_val_loss is not None
                              else -np.inf),
        }

    # ground-truth latent heatmap for latent panels (reference vae.py:300-311)
    _prob = get_prob_from_energy_func_for_vis(normal_energy_func, num=256)
    _gtlatent = get_imshow_plot(_prob, val=6 if is_mnist else 4)

    def visualize(state, i_ep):
        """Full reference vae.py panel set (:497-590): latent scatter/heatmap
        (vs. the ground-truth prior) and data-recon-gen panels — scatter +
        heatmap for toy datasets, sampled + mean image grids for mnist.
        (The reference's toy data-recon-gen tags are unformatted '{}/...'
        literals — a bug documented in README; here they get the mode.)"""
        params = eval_params(state)
        mode = opt.train_mode
        kv = jax.random.fold_in(k_eval, i_ep)
        n_vis = min(20000, n_train)
        xs = jnp.asarray(train_np[:n_vis])
        if binarize:
            xs = jax.random.bernoulli(jax.random.fold_in(kv, 1), xs).astype(
                jnp.float32)
        val = 4 if not is_mnist else 6
        if is_mnist:
            n_grid = min(bs, xs.shape[0])
            output, omu, latent = vae_reconstruct(
                model, params, jax.random.fold_in(kv, 4), xs[:n_grid])
            gen, gmu, _ = vae_generate(model, params,
                                       jax.random.fold_in(kv, 3), n_grid)
            # latent panels over the vis pool, collected in batch-size
            # chunks (one 20k-row conv fwd would be a multi-GB dispatch)
            lat_chunks = []
            for lo in range(0, xs.shape[0], max(bs, 256)):
                _, _, zc = vae_reconstruct(
                    model, params, jax.random.fold_in(kv, 5 + lo),
                    xs[lo:lo + max(bs, 256)])
                lat_chunks.append(np.asarray(zc))
            lat_np = np.concatenate(lat_chunks).reshape(xs.shape[0], -1)
            _sc = get_scatter_plot(lat_np[:, :2], xlim=val, ylim=val)
            writer.add_image(f"{mode}/latent/scatter",
                             convert_npimage_torchimage(_sc), i_ep)
            _latent = get_2d_histogram_plot(lat_np[:, :2], val=val, num=128)
            img = convert_npimage_torchimage(
                np.concatenate([_gtlatent, _latent], axis=1))
            writer.add_image(f"{mode}/latent/heatmap", img, i_ep)
            g = lambda t: get_grid_image(np.asarray(t), n_grid, opt.nchannels,
                                         opt.nheight)
            img1 = np.concatenate([g(xs[:n_grid]), g(output), g(gen)], axis=2)
            writer.add_image(f"{mode}/data-recon-gen/sample", img1, i_ep)
            img2 = np.concatenate([g(xs[:n_grid]), g(omu), g(gmu)], axis=2)
            writer.add_image(f"{mode}/data-recon-gen/mean", img2, i_ep)
        else:
            gen, _, _ = vae_generate(model, params,
                                     jax.random.fold_in(kv, 3), n_vis)
            output, _, latent = vae_reconstruct(model, params,
                                                jax.random.fold_in(kv, 4), xs)
            data_np, out_np, gen_np = (np.asarray(xs), np.asarray(output),
                                       np.asarray(gen))
            lat_np = np.asarray(latent)
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
            _sc = get_scatter_plot(lat_np[:, :2], xlim=val, ylim=val)
            writer.add_image(f"{mode}/latent/scatter",
                             convert_npimage_torchimage(_sc), i_ep)
            _latent = get_2d_histogram_plot(lat_np[:, :2], val=val, num=128)
            img = convert_npimage_torchimage(
                np.concatenate([_gtlatent, _latent], axis=1))
            writer.add_image(f"{mode}/latent/heatmap", img, i_ep)
        writer.flush()

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
            m_idx = jnp.asarray(stream.take(k))
            if mesh is not None:
                m_idx = jax.device_put(m_idx, midx_sharding)
            state, metrics = chunk_fn(state, data_dev, m_idx, k_train,
                                      binarize_flag=binarize)
            i_ep += k
            epoch = (i_ep - 1) // steps_per_epoch + 1
            batch_idx = (i_ep - 1) % steps_per_epoch + 1

            if i_ep % opt.log_interval == 0:
                m = {kk: float(v[-1]) for kk, v in metrics.items()}
                if not all(np.isfinite(v) for v in m.values()):
                    # failure detection (SURVEY.md 5): halt instead of
                    # training on NaN params; final eval reloads best ckpt
                    logging("| NaN/Inf training metrics at iter "
                            f"{i_ep} — halting training early (best "
                            "checkpoint preserved; final eval reloads it): "
                            + ", ".join(f"{kk}={vv}" for kk, vv in m.items()),
                            path=opt.path)
                    break
                beta = float(beta_fn(i_ep - 1))
                elapsed = time.time() - start_time
                elbo = -(m["recon_loss"] + m["kld_loss"])
                logging(
                    "| iter {:d} | epoch {:3d} | {:5d}/{:5d} | ms/step {:5.2f} "
                    "| beta {:5.3f} | loss {:5.4f} | loss (recon) {:5.4f} "
                    "| loss (kld) {:5.4f} | elbo {:5.4f} ".format(
                        i_ep, epoch, batch_idx, steps_per_epoch,
                        elapsed * 1000 / opt.log_interval, beta,
                        m["loss"], m["recon_loss"], m["kld_loss"], elbo),
                    path=opt.path)
                mode = opt.train_mode
                writer.add_scalar(f"{mode}/model/elbo/step", elbo, i_ep)
                writer.add_scalar(f"{mode}/model/loss/step", m["loss"], i_ep)
                writer.add_scalar(f"{mode}/model/recon/step", m["recon_loss"], i_ep)
                writer.add_scalar(f"{mode}/model/kld/step", m["kld_loss"], i_ep)
                writer.add_scalar(f"{mode}/model/beta/step", beta, i_ep)
                start_time = time.time()

            if (opt.train_mode == "train" and opt.eval_iws_interval > 0
                    and i_ep % opt.eval_iws_interval == 0):
                t0 = time.time()
                elbo, logprob = evaluate_iwae_vae(
                    model, eval_params(state), splits["val"], opt.iws_samples,
                    jax.random.fold_in(k_eval, i_ep), binarize=binarize,
                    aux=is_aux, batch=opt.eval_batch_size)
                writer.add_scalar("val/elbo/step", elbo, i_ep)
                writer.add_scalar("val/logprob/iws/step", logprob, i_ep)
                logging("-" * 89, path=opt.path)
                logging("| val       | iter {:d} | epoch {:3d} | {:5d}/{:5d} "
                        "| sec/step {:5.2f} | elbo {:.4f} "
                        "| logprob (iws) {:.4f} ".format(
                            i_ep, epoch, batch_idx, steps_per_epoch,
                            time.time() - t0, elbo, logprob), path=opt.path)
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
        logging("End of training (final)", path=opt.path)

    if opt.skip_final_test_eval:
        logging("| skipping final test eval (--skip-final-test-eval)",
                path=opt.path)
        writer.close()
    elif opt.dataset in ("swissroll", "25gaussians"):
        visualize(state, i_ep)
        # giant final heatmap dump (reference vae.py:676-721: ~1M samples, num=256)
        params = eval_params(state)
        kd = jax.random.fold_in(k_eval, 999_979)
        n_dump = min(1_000_000, n_train)
        chunks_d, chunks_o, chunks_g, chunks_l = [], [], [], []
        for lo in range(0, n_dump, 131072):
            xs = jnp.asarray(train_np[lo:lo + 131072])
            kc = jax.random.fold_in(kd, lo)
            out, _, zc = vae_reconstruct(model, params,
                                         jax.random.fold_in(kc, 1), xs)
            gen, _, _ = vae_generate(model, params,
                                     jax.random.fold_in(kc, 2), xs.shape[0])
            chunks_d.append(np.asarray(xs))
            chunks_o.append(np.asarray(out))
            chunks_g.append(np.asarray(gen))
            chunks_l.append(np.asarray(zc))
        _d = get_2d_histogram_plot(np.concatenate(chunks_d), val=6, num=256)
        _o = get_2d_histogram_plot(np.concatenate(chunks_o), val=6, num=256)
        _g = get_2d_histogram_plot(np.concatenate(chunks_g), val=6, num=256)
        img = convert_npimage_torchimage(np.concatenate([_d, _o, _g], axis=1))
        writer.add_image("test/data-recon-gen/heatmap", img, 0)
        _l = get_2d_histogram_plot(np.concatenate(chunks_l)[:, :2], val=4, num=256)
        img = convert_npimage_torchimage(np.concatenate([_gtlatent, _l], axis=1))
        writer.add_image("test/latent/heatmap", img, 0)
        writer.close()
    else:
        flavor = f"{prefix}checkpoint" if final_mode else "best-checkpoint"
        restored = load_checkpoint(state, opt.path, flavor)
        if restored is not None:
            state, _ = restored
        else:
            logging(f"| warning: no {flavor} on disk — evaluating the live "
                    "train state instead", path=opt.path)
        t0 = time.time()
        elbo, logprob = evaluate_iwae_vae(
            model, eval_params(state), splits["test"], opt.iws_samples,
            jax.random.fold_in(k_eval, 999_983), binarize=binarize, aux=is_aux,
            batch=opt.eval_batch_size)
        writer.add_scalar("test/elbo/step", elbo, 0)
        writer.add_scalar("test/logprob/iws/step", logprob, 0)
        logging("-" * 89, path=opt.path)
        logging("| test       | sec/step {:5.2f} | elbo {:.4f} "
                "| logprob (iws) {:.4f} ".format(time.time() - t0, elbo, logprob),
                path=opt.path)
        logging("-" * 89, path=opt.path)
        writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
