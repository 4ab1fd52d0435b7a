"""Driver-level integration tests (CPU): flag surface, experiment naming,
train -> checkpoint -> resume continuation for both CLIs."""

import glob
import math
import os
import re

import pytest

from ardae_tpu.cli.ivae_ardae import build_parser as ivae_parser
from ardae_tpu.cli.ivae_ardae import derive_experiment as ivae_expname
from ardae_tpu.cli.ivae_ardae import main as ivae_main
from ardae_tpu.cli.vae import build_parser as vae_parser
from ardae_tpu.cli.vae import derive_experiment as vae_expname
from ardae_tpu.cli.vae import main as vae_main

CANONICAL_25G = (
    "--dataset 25gaussians --nheight 1 --nchannels 2 "
    "--model mlp-concat --model-z-dim 2 --model-h-dim 16 --model-n-layers 2 "
    "--model-nonlin relu --model-n-dim 4 "
    "--cdae mlp-grad --cdae-h-dim 16 --cdae-n-layers 2 --cdae-nonlin softplus "
    "--cdae-ctx-type lt0 --train-batch-size 64 --eval-batch-size 1 "
    "--train-nz-cdae 8 --train-nz-model 1 --delta 0.1 --std-scale 100 "
    "--num-cdae-updates 1 --m-lr 0.0001 --m-optimizer adam --m-beta1 0.5 "
    "--d-lr 0.0001 --d-optimizer rmsprop --d-momentum 0.5 --epochs 4 "
    "--eval-iws-interval 0 --iws-samples 8 --log-interval 10 "
    "--vis-interval 100000 --ckpt-interval 20 --toy-train-size 2000 "
).split()


def test_reference_flag_surface_parses():
    """Every flag from the reference parsers must be accepted."""
    opt = ivae_parser().parse_args(
        "--dataset sbmnist --model auxresconvct-clip --model-clip-z0-logvar none "
        "--cdae mlp-res --std-scale 100 --delta 0.1 --num-cdae-updates 2 "
        "--train-nstd-cdae 3 --m-weight-avg polyak --m-weight-avg-start 10 "
        "--train-mode final --no-resume --exp-num 3 --d-lr-min 0.0001 "
        "--beta-init 0.0001 --beta-fin 1.0 --beta-annealing 50000 "
        "--eta-init 0 --eta-fin 0 --lmbd-init 0 --lmbd-fin 0 "
        "--start-epoch 2 --start-batch-idx 5 --sav-interval 0 --no-cuda".split()
    )
    assert opt.model == "auxresconvct-clip" and opt.train_mode == "final"
    opt2 = vae_parser().parse_args(
        "--dataset dbmnist-val5k --model resconv --model-clip-logvar none "
        "--optimizer amsgrad --beta1 0.9 --momentum 0.9 --weight-avg swa "
        "--weight-avg-start 5 --weight-avg-decay 0.99 --train-mode train".split()
    )
    assert opt2.model == "resconv"


def test_experiment_name_format():
    opt = ivae_parser().parse_args(CANONICAL_25G)
    for name in ("beta_annealing", "eta_annealing", "lmbd_annealing"):
        if getattr(opt, name) is not None and getattr(opt, name) < 1:
            setattr(opt, name, None)
    name = ivae_expname(opt)
    # reference format: m{model}-mz..-mh..-... (ivae_ardae.py:212-262)
    assert name.startswith("mmlp-concat-mz2-mh16-mn4-mnh2-marelu-")
    assert "-dmlp-grad-dh16-dnh2-dasfp-dctlt0-" in name
    assert "-ssc100.0-del0.1-nzc8-nzm1-0" in name

    vopt = vae_parser().parse_args(["--dataset", "dbmnist", "--model", "mnist"])
    vname = vae_expname(vopt)
    assert vname.startswith("vae-dbmnist-mmnist-")


@pytest.mark.slow
def test_ivae_cli_train_and_resume(tmp_path):
    """Short train run, then re-invoke the same command: it must resume into
    the same experiment dir from the checkpoint (reference resume semantics,
    ivae_ardae.py:263-274 + utils/msc.py:74-96)."""
    args = CANONICAL_25G + ["--cache", str(tmp_path), "--exp-num", "7",
                            "--data-root", str(tmp_path / "data"),
                            "--max-iters", "40"]
    assert ivae_main(args) == 0
    dirs = glob.glob(str(tmp_path / "*" ))
    dirs = [d for d in dirs if os.path.isdir(d) and "data" not in os.path.basename(d)]
    assert len(dirs) == 1
    log1 = open(os.path.join(dirs[0], "log.txt")).read()
    assert "| iter 40 " in log1
    assert os.path.exists(os.path.join(dirs[0], "checkpoint"))

    # resume: same command, higher cap -> continues from iter 40
    args2 = [a for a in args]
    args2[args2.index("40")] = "60"
    assert ivae_main(args2) == 0
    dirs2 = [d for d in glob.glob(str(tmp_path / "*"))
             if os.path.isdir(d) and "data" not in os.path.basename(d)]
    assert len(dirs2) == 1 and dirs2[0] == dirs[0]  # SAME experiment dir
    log2 = open(os.path.join(dirs[0], "log.txt")).read()
    post = log2[len(log1):]
    assert "loaded checkpoint" not in post  # load prints to stdout, not log
    iters = [int(m) for m in re.findall(r"\| iter (\d+) ", post)]
    assert iters and min(iters) > 40 and max(iters) == 60


@pytest.mark.slow
def test_ivae_cli_final_mode(tmp_path):
    """train mode -> best checkpoint -> final mode retrains on train+val up
    to the best iteration and writes final-checkpoint (reference
    ivae_ardae.py:283-287, 1141-1167)."""
    # argparse: a later --eval-iws-interval overrides CANONICAL_25G's 0
    args = CANONICAL_25G + ["--cache", str(tmp_path), "--exp-num", "9",
                            "--data-root", str(tmp_path / "data"),
                            "--max-iters", "40"]
    assert ivae_main(args + ["--eval-iws-interval", "20"]) == 0
    exp = [d for d in glob.glob(str(tmp_path / "*"))
           if os.path.isdir(d) and "data" not in os.path.basename(d)][0]
    assert os.path.exists(os.path.join(exp, "best-checkpoint"))

    assert ivae_main(args + ["--train-mode", "final",
                             "--eval-iws-interval", "20"]) == 0
    assert os.path.exists(os.path.join(exp, "final-checkpoint"))
    log = open(os.path.join(exp, "log.txt")).read()
    assert "End of training (final)" in log
    # final test eval printed for mnist datasets only; toy writes heatmaps
    assert log.count("Namespace") == 2  # both invocations logged


@pytest.mark.slow
def test_ivae_cli_polyak_and_nstd(tmp_path):
    """Weight averaging + nstd>1 through the CLI surface."""
    args = CANONICAL_25G + ["--cache", str(tmp_path), "--exp-num", "11",
                            "--data-root", str(tmp_path / "data"),
                            "--max-iters", "30",
                            "--m-weight-avg", "polyak",
                            "--m-weight-avg-start", "5",
                            "--train-nstd-cdae", "2",
                            "--eval-iws-interval", "20"]
    assert ivae_main(args) == 0
    exp = [d for d in glob.glob(str(tmp_path / "*"))
           if os.path.isdir(d) and "data" not in os.path.basename(d)][0]
    log = open(os.path.join(exp, "log.txt")).read()
    assert "nzc8-nzs2" in log  # nstd encoded in the experiment name
    assert "mwapolyak-was5" in log
    assert "logprob (iws)" in log  # eval used the averaged params


@pytest.mark.slow
def test_ivae_cli_mixed_precision_both_phases(tmp_path):
    """--cdae-compute-dtype + --model-compute-dtype wired through to the
    joint step (guards against the parsed-but-not-wired class of bug)."""
    args = CANONICAL_25G + ["--cache", str(tmp_path), "--exp-num", "17",
                            "--data-root", str(tmp_path / "data"),
                            "--max-iters", "20",
                            "--cdae-compute-dtype", "bfloat16",
                            "--model-compute-dtype", "bfloat16"]
    assert ivae_main(args) == 0
    exp = [d for d in glob.glob(str(tmp_path / "*"))
           if os.path.isdir(d) and "data" not in os.path.basename(d)][0]
    log = open(os.path.join(exp, "log.txt")).read()
    assert "| iter 20 " in log
    assert "model_compute_dtype='bfloat16'" in log  # Namespace echoed to log
    for line in log.splitlines():
        if "| iter 20 " in line:
            assert "nan" not in line.lower()


@pytest.mark.slow
def test_ivae_cli_data_parallel_mesh(tmp_path):
    """--dp-devices 8: batches sharded over the (virtual) 8-device mesh,
    params replicated, XLA all-reduces grads. Training trajectory must
    match the single-device run closely (same fold_in(seed, step) noise;
    only reduction order differs)."""
    import re as _re

    def run(tag, extra):
        args = CANONICAL_25G + ["--cache", str(tmp_path / tag), "--exp-num", "21",
                                "--data-root", str(tmp_path / "data"),
                                "--max-iters", "20"] + extra
        assert ivae_main(args) == 0
        exp = [d for d in glob.glob(str(tmp_path / tag / "*"))
               if os.path.isdir(d)][0]
        log = open(os.path.join(exp, "log.txt")).read()
        m = _re.findall(r"loss \(vae\) ([-\d.]+)", log)
        return log, [float(v) for v in m]

    log_dp, losses_dp = run("dp", ["--dp-devices", "8"])
    assert "data-parallel mesh over 8" in log_dp
    _, losses_1 = run("single", [])
    assert len(losses_dp) == len(losses_1) == 2
    for a, b in zip(losses_dp, losses_1):
        assert abs(a - b) < 0.05 * (1 + abs(b)), (losses_dp, losses_1)


@pytest.mark.slow
def test_vae_cli_data_parallel_mesh(tmp_path):
    args = (
        "--dataset 25gaussians --nheight 1 --nchannels 2 --model toy "
        "--model-z-dim 2 --model-h-dim 16 --model-n-layers 2 "
        "--model-nonlin softplus --train-batch-size 64 --optimizer adam "
        "--beta1 0.5 --lr 0.001 --epochs 1 --eval-iws-interval 0 "
        "--iws-samples 8 --log-interval 10 --vis-interval 100000 "
        "--ckpt-interval 100000 --toy-train-size 2000 --max-iters 20 "
        "--dp-devices 8"
    ).split() + ["--cache", str(tmp_path), "--data-root", str(tmp_path / "d")]
    assert vae_main(args) == 0
    exp = [d for d in glob.glob(str(tmp_path / "vae-*")) if os.path.isdir(d)][0]
    log = open(os.path.join(exp, "log.txt")).read()
    assert "data-parallel mesh over 8" in log and "| iter 20 " in log


@pytest.mark.slow
def test_ivae_cli_vis_panels_toy(tmp_path):
    """Exercise the full toy visualization panel set (latent scatter/heatmap,
    alllatent composite, data-recon-gen scatter+heatmap, per-item logvar
    hists) plus the post-training giant num=256 dump — reference
    ivae_ardae.py:953-1114 and :1224-1260."""
    args = CANONICAL_25G + ["--cache", str(tmp_path), "--exp-num", "13",
                            "--data-root", str(tmp_path / "data"),
                            "--max-iters", "10", "--vis-interval", "10"]
    assert ivae_main(args) == 0
    exp = [d for d in glob.glob(str(tmp_path / "*"))
           if os.path.isdir(d) and "data" not in os.path.basename(d)][0]
    events = glob.glob(os.path.join(exp, "events.out.tfevents*"))
    assert events and os.path.getsize(events[0]) > 50_000  # image panels logged


@pytest.mark.slow
def test_ivae_cli_vis_panels_mnist(tmp_path):
    """MNIST panel set: data-recon-gen sampled + mean grids and latent
    panels through the CLI (reference ivae_ardae.py:1049-1114)."""
    args = (
        "--dataset dbmnist-val5k --nheight 28 --nchannels 1 "
        "--model mnist-concat --model-z-dim 4 --model-h-dim 16 "
        "--model-n-layers 2 --model-nonlin softplus --model-n-dim 8 "
        "--cdae mlp-res --cdae-h-dim 16 --cdae-n-layers 2 "
        "--cdae-nonlin softplus --cdae-ctx-type lt0 --train-batch-size 32 "
        "--eval-batch-size 1 --train-nz-cdae 8 --delta 0.1 --std-scale 100 "
        "--m-optimizer adam --d-optimizer rmsprop --epochs 1 "
        "--eval-iws-interval 0 --iws-samples 8 --log-interval 4 "
        "--vis-interval 4 --ckpt-interval 100000 --max-iters 4"
    ).split() + ["--cache", str(tmp_path), "--data-root", str(tmp_path / "data")]
    assert ivae_main(args) == 0
    exp = [d for d in glob.glob(str(tmp_path / "*"))
           if os.path.isdir(d) and "data" not in os.path.basename(d)][0]
    events = glob.glob(os.path.join(exp, "events.out.tfevents*"))
    assert events and os.path.getsize(events[0]) > 50_000


@pytest.mark.slow
def test_vae_cli_vis_panels(tmp_path):
    """Baseline-driver panels: toy data-recon-gen + latent panels and the
    final giant dump (reference vae.py:497-547, :676-721)."""
    args = (
        "--dataset 25gaussians --nheight 1 --nchannels 2 --model toy "
        "--model-z-dim 2 --model-h-dim 16 --model-n-layers 2 "
        "--model-nonlin softplus --train-batch-size 64 --optimizer adam "
        "--beta1 0.5 --lr 0.001 --epochs 1 --eval-iws-interval 0 "
        "--iws-samples 8 --log-interval 10 --vis-interval 10 "
        "--ckpt-interval 100000 --toy-train-size 2000 --max-iters 10"
    ).split() + ["--cache", str(tmp_path), "--data-root", str(tmp_path / "d")]
    assert vae_main(args) == 0
    exp = [d for d in glob.glob(str(tmp_path / "vae-*")) if os.path.isdir(d)][0]
    events = glob.glob(os.path.join(exp, "events.out.tfevents*"))
    assert events and os.path.getsize(events[0]) > 50_000


@pytest.mark.slow
def test_vae_cli_vis_panels_mnist(tmp_path):
    """vae driver MNIST panels: latent pool collected in chunks, sampled +
    mean grids (reference vae.py:548-590)."""
    args = (
        "--dataset dbmnist-val5k --nheight 28 --nchannels 1 --model mnist "
        "--model-z-dim 4 --model-h-dim 16 --model-n-layers 2 "
        "--model-nonlin softplus --train-batch-size 32 --optimizer adam "
        "--beta1 0.5 --lr 0.001 --epochs 1 --eval-iws-interval 0 "
        "--iws-samples 8 --log-interval 4 --vis-interval 4 "
        "--ckpt-interval 100000 --max-iters 4"
    ).split() + ["--cache", str(tmp_path), "--data-root", str(tmp_path / "d")]
    assert vae_main(args) == 0
    exp = [d for d in glob.glob(str(tmp_path / "vae-*")) if os.path.isdir(d)][0]
    events = glob.glob(os.path.join(exp, "events.out.tfevents*"))
    assert events and os.path.getsize(events[0]) > 50_000


@pytest.mark.slow
def test_vae_cli_short_run(tmp_path):
    args = (
        "--dataset 25gaussians --nheight 1 --nchannels 2 --model toy "
        "--model-z-dim 2 --model-h-dim 16 --model-n-layers 2 "
        "--model-nonlin softplus --train-batch-size 64 --optimizer adam "
        "--beta1 0.5 --lr 0.001 --epochs 2 --eval-iws-interval 20 "
        "--iws-samples 8 --log-interval 10 --vis-interval 100000 "
        "--ckpt-interval 20 --toy-train-size 2000 --max-iters 30"
    ).split() + ["--cache", str(tmp_path), "--data-root", str(tmp_path / "d")]
    assert vae_main(args) == 0
    dirs = [d for d in glob.glob(str(tmp_path / "vae-*")) if os.path.isdir(d)]
    assert len(dirs) == 1
    log = open(os.path.join(dirs[0], "log.txt")).read()
    assert "elbo" in log and "| iter 30 " in log
    assert os.path.exists(os.path.join(dirs[0], "best-checkpoint"))

    # final mode: retrains on train+val to the best iteration
    assert vae_main(args + ["--train-mode", "final"]) == 0
    assert os.path.exists(os.path.join(dirs[0], "final-checkpoint"))
    log2 = open(os.path.join(dirs[0], "log.txt")).read()
    assert "End of training (final)" in log2


def test_canonical_scripts_parse():
    """Every CLI line in scripts/run_vae_*.sh must parse against our flag
    surface (the reference's own dbmnist script fails this for its stale
    --init-method/--do-m5bias flags — documented-not-replicated)."""
    import shlex

    root = os.path.join(os.path.dirname(__file__), "..", "scripts")
    n_lines = 0
    for sh in sorted(glob.glob(os.path.join(root, "run_vae_*.sh"))):
        body = open(sh).read().replace("\\\n", " ")
        for line in body.splitlines():
            line = line.strip()
            if not line.startswith("python -m ardae_tpu.cli."):
                continue
            toks = shlex.split(line)
            driver, flags = toks[2], toks[3:]
            parser = (ivae_parser() if driver.endswith("ivae_ardae")
                      else vae_parser())
            opt = parser.parse_args(flags)
            assert opt.dataset
            n_lines += 1
    assert n_lines == 1 + 12 + 4  # 25gaussians + dbmnist + sbmnist lines


@pytest.mark.slow
def test_ivae_cli_no_cuda_runs_on_host(tmp_path):
    """--no-cuda selects the host platform (reference ivae_ardae.py:199-200:
    cuda = not no_cuda and available). Under the CPU test mesh this is a
    same-value config update; the run must complete normally."""
    args = CANONICAL_25G + ["--cache", str(tmp_path), "--exp-num", "11",
                            "--data-root", str(tmp_path / "data"),
                            "--max-iters", "10", "--no-cuda"]
    assert ivae_main(args) == 0
    import jax

    assert jax.default_backend() == "cpu"


@pytest.mark.slow
def test_vae_cli_bf16_mixed_precision(tmp_path):
    """--model-compute-dtype bfloat16 in the baseline driver: short runs of a
    flat (toy) and a hierarchical (auxmnist) model must train with finite
    losses (bf16 matmuls, fp32 sampling + reductions)."""
    args = (
        "--dataset 25gaussians --nheight 1 --nchannels 2 --model toy "
        "--model-z-dim 2 --model-h-dim 16 --model-n-layers 2 "
        "--model-nonlin softplus --train-batch-size 64 --optimizer adam "
        "--beta1 0.5 --lr 0.001 --epochs 2 --eval-iws-interval 0 "
        "--iws-samples 8 --log-interval 10 --vis-interval 100000 "
        "--ckpt-interval 1000 --toy-train-size 2000 --max-iters 20 "
        "--model-compute-dtype bfloat16"
    ).split() + ["--cache", str(tmp_path), "--data-root", str(tmp_path / "d")]
    assert vae_main(args) == 0
    dirs = [d for d in glob.glob(str(tmp_path / "vae-*")) if os.path.isdir(d)]
    log = open(os.path.join(dirs[0], "log.txt")).read()
    assert "| iter 20 " in log and "nan" not in log.lower().split("elbo")[-1]

    args2 = (
        "--dataset dbmnist --nheight 28 --nchannels 1 --model auxmnist "
        "--model-z-dim 4 --model-h-dim 16 --model-n-layers 2 "
        "--model-nonlin softplus --model-n-dim 4 --train-batch-size 16 "
        "--optimizer adam --beta1 0.5 --lr 0.001 --epochs 1 "
        "--eval-iws-interval 0 --iws-samples 8 --log-interval 5 "
        "--vis-interval 100000 --ckpt-interval 1000 --max-iters 10 "
        "--model-compute-dtype bfloat16"
    ).split() + ["--cache", str(tmp_path / "m"), "--data-root",
                 str(tmp_path / "d2")]
    assert vae_main(args2) == 0


@pytest.mark.slow
def test_ivae_cli_sample_parallel_mesh(tmp_path):
    """--dp-devices 2 --sp-devices 4: 2-D (data, sample) mesh — batch rows
    over "data", the nz_cdae sample axis over "sample". Trajectory must
    match the single-device run (same noise; only reduction order differs)."""
    import re as _re

    def run(tag, extra):
        args = CANONICAL_25G + ["--cache", str(tmp_path / tag), "--exp-num", "22",
                                "--data-root", str(tmp_path / "data"),
                                "--max-iters", "20"] + extra
        assert ivae_main(args) == 0
        exp = [d for d in glob.glob(str(tmp_path / tag / "*"))
               if os.path.isdir(d)][0]
        log = open(os.path.join(exp, "log.txt")).read()
        m = _re.findall(r"loss \(vae\) ([-\d.]+)", log)
        return log, [float(v) for v in m]

    log_sp, losses_sp = run("sp", ["--dp-devices", "2", "--sp-devices", "4"])
    assert "(data, sample) mesh over 8" in log_sp
    _, losses_1 = run("single", [])
    assert len(losses_sp) == len(losses_1) == 2
    for a, b in zip(losses_sp, losses_1):
        assert abs(a - b) < 0.05 * (1 + abs(b)), (losses_sp, losses_1)


def test_ivae_cli_nan_halt(tmp_path, monkeypatch):
    """Failure detection (SURVEY.md 5, absent in the reference): if training
    metrics go NaN, the driver halts instead of training on NaN params, and
    the post-training eval still runs from the best checkpoint."""
    import ardae_tpu.train.step as step_mod

    real_build = step_mod.build_train_chunk

    def poisoned_build(model, cdae, opt_m, opt_d, cfg, beta_fn=None):
        real_chunk = real_build(model, cdae, opt_m, opt_d, cfg, beta_fn=beta_fn)

        def chunk(state, data, ci, mi, key, beta0, binarize=False):
            import jax.numpy as jnp

            new_state, metrics = real_chunk(state, data, ci, mi, key, beta0,
                                            binarize=binarize)
            # poison everything after iteration 10
            poison = jnp.where(new_state.step > 10, jnp.nan, 0.0)
            metrics = {k: v + poison for k, v in metrics.items()}
            return new_state, metrics

        return chunk

    monkeypatch.setattr(step_mod, "build_train_chunk", poisoned_build)
    args = CANONICAL_25G + ["--cache", str(tmp_path), "--exp-num", "31",
                            "--data-root", str(tmp_path / "data"),
                            "--max-iters", "40"]
    assert ivae_main(args) == 0
    exp = [d for d in glob.glob(str(tmp_path / "*"))
           if os.path.isdir(d) and "data" not in os.path.basename(d)][0]
    log = open(os.path.join(exp, "log.txt")).read()
    assert "halting training early" in log
    assert "| iter 40 " not in log  # did NOT keep training to the cap


def test_eval_batch_size_honored(monkeypatch):
    """An explicit --eval-batch-size must control the eval grouping size
    (VERDICT r1: the flag was parsed but overridden by the auto batching).
    batch=None keeps the throughput-tuned auto default."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ardae_tpu.models.ivae.api as api
    from ardae_tpu.cli.common import evaluate_iws_ivae
    from ardae_tpu.models.ivae.toy import ToyIPVAE

    model = ToyIPVAE(input_dim=2, noise_dim=4, h_dim=8, z_dim=2,
                     nonlinearity="relu", num_hidden_layers=1,
                     enc_type="concat")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 2)),
                        jnp.zeros((2, 4)))
    data = np.random.default_rng(0).normal(size=(7, 2)).astype(np.float32)

    shapes = []
    real = api.logprob_iws

    def spy(model, params, key, x, n, jitter=0.0, reduce="mean"):
        shapes.append(int(x.shape[0]))  # trace-time: one entry per shape
        return real(model, params, key, x, n, jitter=jitter, reduce=reduce)

    from ardae_tpu.cli import common
    common._EVAL_FN_CACHE.clear()  # force a fresh trace through the spy
    monkeypatch.setattr(api, "logprob_iws", spy)
    try:
        lp = evaluate_iws_ivae(model, params, data, 4, jax.random.PRNGKey(1),
                               batch=3)
        assert np.isfinite(lp)
        # 7 items at batch=3: two full batches + a 1-row tail PADDED to 3 —
        # exactly ONE traced shape, and it is the requested batch size
        assert shapes == [3]
    finally:
        common._EVAL_FN_CACHE.clear()  # don't leave the spy'd fn cached


@pytest.mark.slow
def test_real_format_end_to_end(tmp_path):
    """Dress rehearsal for real MNIST files (VERDICT r1 item 7): write the
    surrogate out in the REAL idx/amat formats, then train + IWS-eval both
    mnist datasets through the CLI from those files — the same parse ->
    split cache -> HBM -> binarize -> train -> eval path real data will
    take. scripts/real_format_rehearsal.sh is the full-size version."""
    import subprocess
    import sys

    root = tmp_path / "data"
    subprocess.run(
        [sys.executable, "scripts/make_real_format_files.py", str(root),
         "--small"],
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    common = (
        "--nheight 28 --nchannels 1 --model mnist-concat --model-z-dim 4 "
        "--model-h-dim 32 --model-n-layers 1 --model-nonlin softplus "
        "--model-n-dim 8 --cdae mlp-grad --cdae-h-dim 16 --cdae-n-layers 2 "
        "--cdae-nonlin softplus --cdae-ctx-type lt0 --train-batch-size 64 "
        "--train-nz-cdae 8 --train-nz-model 1 --delta 0.1 --std-scale 100 "
        "--m-lr 0.0001 --m-optimizer adam --m-beta1 0.5 --d-lr 0.0001 "
        "--d-optimizer rmsprop --d-momentum 0.5 --epochs 2 --max-iters 12 "
        "--eval-iws-interval 12 --iws-samples 8 --eval-batch-size 64 "
        "--log-interval 6 --vis-interval 100000 --ckpt-interval 12 "
    ).split() + ["--data-root", str(root), "--cache", str(tmp_path / "exp")]

    for ds, num in (("dbmnist-val5k", "92"), ("sbmnist", "93")):
        assert ivae_main(["--dataset", ds] + common + ["--exp-num", num]) == 0
        exp = [d for d in glob.glob(str(tmp_path / "exp" / f"*-{num}-*"))
               if os.path.isdir(d)][0]
        log = open(os.path.join(exp, "log.txt")).read()
        assert "real files from" in log, f"{ds} fell back to the surrogate"
        m = re.search(r"logprob \(iws\) (-?[\d.]+)", log)
        assert m and math.isfinite(float(m.group(1))), "IWS not logged/finite"
