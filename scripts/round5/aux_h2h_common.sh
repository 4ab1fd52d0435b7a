# shellcheck shell=bash
# Shared run helpers for the round-5 aux head-to-head waves.
#
# Encodes the EXACT flag surface of the round-4 reduced-scale matched pairs
# (VALIDATION.md "Aux pair, matched-effort hyperparameter search"): v3
# surrogate dbMNIST-val5k, bs=32, nz_cdae=64, beta fixed 1.0, adam(0.5) +
# rmsprop(0.5), implicit side auxmnist + mlp-grad(h256 L5, hidden1a) at
# std-scale 100 / delta 0.1 / d-lr 1e-4, Gaussian side cli.vae auxmnist.
# Round 4 kept these only in /tmp (queue*.sh) and they were lost at round
# teardown — committed here so every VALIDATION table row's generating
# command is in git (VERDICT r4 item 7).
#
# Reference flag provenance: canonical auxmnist lines of
# /root/reference/run_vae_dbmnist.sh (mirrored in scripts/run_vae_dbmnist.sh).

cd "$(dirname "${BASH_SOURCE[0]}")/../.." || exit 1
export PYTHONUNBUFFERED=1

# run_implicit <mlr> <upd> <seed> <iters> <tag> [extra flags...]
run_implicit() {
  local mlr=$1 upd=$2 seed=$3 iters=$4 tag=$5; shift 5
  python -m ardae_tpu.cli.ivae_ardae \
    --cache experiments/aux-h2h-r5 --experiment "imp-$tag" \
    --dataset dbmnist-val5k --nheight 28 --nchannels 1 \
    --train-batch-size 32 --eval-batch-size 32 \
    --m-optimizer adam --m-momentum 0.5 --m-beta1 0.5 \
    --d-optimizer rmsprop --d-momentum 0.5 --d-beta1 0.5 \
    --train-nstd-cdae 1 --train-nz-cdae 64 --train-nz-model 1 \
    --model auxmnist --model-z-dim 32 --model-h-dim 300 --model-n-layers 2 \
    --model-nonlin softplus --model-n-dim 100 \
    --model-clip-z0-logvar none --model-clip-z-logvar none \
    --cdae mlp-grad --cdae-h-dim 256 --cdae-n-layers 5 --cdae-nonlin softplus \
    --cdae-ctx-type hidden1a \
    --m-lr "$mlr" --d-lr 0.0001 --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
    --delta 0.1 --std-scale 100 --num-cdae-updates "$upd" \
    --epochs 100000 --max-iters "$iters" --seed "$seed" --no-cuda \
    --eval-iws-interval 100000 --iws-samples 64 \
    --m-weight-avg none --m-weight-avg-start -1 --m-weight-avg-decay 0.998 \
    --log-interval 500 --vis-interval 1000000 --ckpt-interval "$iters" \
    --skip-final-test-eval --train-mode train "$@"
}

# run_baseline <lr> <seed> <iters> <tag> [extra flags...]
run_baseline() {
  local lr=$1 seed=$2 iters=$3 tag=$4; shift 4
  python -m ardae_tpu.cli.vae \
    --cache experiments/aux-h2h-r5 --experiment "base-$tag" \
    --dataset dbmnist-val5k --nheight 28 --nchannels 1 \
    --train-batch-size 32 --eval-batch-size 32 \
    --optimizer adam --momentum 0.5 --beta1 0.5 \
    --model auxmnist --model-z-dim 32 --model-h-dim 300 --model-n-layers 2 \
    --model-nonlin softplus --model-n-dim 100 --model-clip-logvar none \
    --lr "$lr" --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
    --epochs 100000 --max-iters "$iters" --seed "$seed" --no-cuda \
    --eval-iws-interval 100000 --iws-samples 64 \
    --weight-avg none --weight-avg-start -1 --weight-avg-decay 0.998 \
    --log-interval 500 --vis-interval 1000000 --ckpt-interval "$iters" \
    --skip-final-test-eval --train-mode train "$@"
}

# newest experiment dir for a tag: latest_dir <imp|base> <tag>
latest_dir() {
  ls -d "experiments/aux-h2h-r5/$1-$2"-* 2>/dev/null | sort | tail -1
}

# eval_implicit <tag>  /  eval_baseline <tag> <lr>  — reference-law evals on
# the shared 500-item rng(1234)-binarized val set (committed harnesses)
eval_implicit() {
  local d; d=$(latest_dir imp "$1")
  python scripts/aux_parity_eval_ours_mnist.py "$d" checkpoint
}
eval_baseline() {
  local d; d=$(latest_dir base "$1")
  python scripts/aux_parity_eval_baseline_mnist.py "$d" checkpoint --lr "$2" --law exact
  python scripts/aux_parity_eval_baseline_mnist.py "$d" checkpoint --lr "$2" --law cov
}
