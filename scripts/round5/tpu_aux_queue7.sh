#!/bin/bash
# Round-5 TPU aux queue #7 — close the three open cells left in the
# auxresconvct story (VALIDATION.md queue-5 section caveats):
#   arm A: RE-RUN of queue5 arm B — auxresconvct UNCLIPPED, fp32,
#          m-lr 3e-4, seed 1 (the original exited silently during the
#          11:42-12:28 UTC axon tunnel wedge). Decides whether the lr
#          fix alone rescues the unclipped variant or the clip matters.
#   arm B: seed-2 replication of the headline run (auxresconvct-clip,
#          bf16 both phases, m-lr 3e-4). The pre-fix 1e-3 frontier was
#          basin-chaotic ACROSS SEEDS (-83/-132/-140/early-NaN); one
#          seed finishing NaN-free at 3e-4 could still be basin luck.
#   arm C: baseline auxresconv VAE at lr 3e-4 — the symmetric caveat in
#          the queue5 section ("the baseline arm has not been given an
#          lr search"). Canonical run_vae_dbmnist.sh line 19 with
#          lr 1e-4 -> 3e-4, 60k iters.
# Waits for queue #6 (serial TPU occupancy).
cd "$(dirname "$0")/../.." || exit 1
export PYTHONUNBUFFERED=1
mkdir -p artifacts/round5

while [ ! -f artifacts/round5/TPU_QUEUE6_DONE ]; do sleep 60; done

run_arc() {  # run_arc <tag> <model> <seed> [extra flags...]
  local tag=$1 model=$2 seed=$3; shift 3
  echo "=== $tag 60k ($(date -u)) ==="
  python -m ardae_tpu.cli.ivae_ardae --cache experiments/aux-canonical-r5 \
    --experiment "$tag" \
    --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
    --eval-batch-size 1 --m-optimizer adam --m-momentum 0.9 --m-beta1 0.9 \
    --d-optimizer rmsprop --d-momentum 0.9 --d-beta1 0.9 \
    --train-nstd-cdae 1 --train-nz-cdae 625 --train-nz-model 1 \
    --model "$model" --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
    --model-nonlin elu --model-n-dim 100 \
    --model-clip-z0-logvar none --model-clip-z-logvar none \
    --cdae mlp-res --cdae-h-dim 512 --cdae-n-layers 5 --cdae-nonlin softplus \
    --cdae-ctx-type hidden1a \
    --m-lr 0.0003 --d-lr 0.0001 \
    --beta-init 0.0001 --beta-fin 1.0 --beta-annealing 50000 \
    --delta 0.1 --std-scale 100 --num-cdae-updates 2 \
    --epochs 6400 --max-iters 60000 --seed "$seed" \
    --eval-iws-interval 10000 --iws-samples 256 \
    --m-weight-avg none --m-weight-avg-start -1 --m-weight-avg-decay 0.998 \
    --log-interval 100 --vis-interval 1000000 --ckpt-interval 5000 \
    --train-mode train "$@" 2>&1 | tail -20
}

run_arc arc-mlr3e-4-fp32-rerun auxresconvct 1
run_arc arc-clip-mlr3e-4-bf16-s2 auxresconvct-clip 2 \
  --model-compute-dtype bfloat16 --cdae-compute-dtype bfloat16

echo "=== baseline auxresconv lr3e-4 60k ($(date -u)) ==="
python -m ardae_tpu.cli.vae --cache experiments/aux-canonical-r5 \
  --experiment base-auxresconv-lr3e-4 \
  --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
  --eval-batch-size 32 --optimizer adam --momentum 0.9 --beta1 0.9 \
  --model auxresconv --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
  --model-nonlin elu --model-n-dim 100 --model-clip-logvar none \
  --lr 0.0003 --beta-init 0.0001 --beta-fin 1.0 --beta-annealing 0 \
  --epochs 6400 --max-iters 60000 --seed 1 \
  --eval-iws-interval 5000 --iws-samples 256 \
  --weight-avg none --weight-avg-start -1 --weight-avg-decay 0.998 \
  --log-interval 100 --vis-interval 1000000 --ckpt-interval 5000 \
  --train-mode train 2>&1 | tail -20

echo "=== queue7 done ($(date -u)) ==="
touch artifacts/round5/TPU_QUEUE7_DONE
