#!/bin/bash
# Round-5 TPU aux queue #8 — seed-2 replications of the two headline
# both-sides-searched canonical cells (queues 2/6 were seed 1, n=1):
#   arm A: implicit auxmnist ssc100 + m-lr 3e-4, seed 2 (queue2 cell)
#   arm B: baseline auxmnist lr 3e-4, seed 2
#   arm C: implicit auxconv ssc100 + m-lr 3e-4, seed 2 (queue6 cell)
#   arm D: baseline auxconv lr 3e-4, seed 2
# Gives every decisive aux row a paired n=2 (seed 1 + seed 2) on both
# sides. Waits for queue #7 (serial TPU occupancy).
cd "$(dirname "$0")/../.." || exit 1
export PYTHONUNBUFFERED=1
mkdir -p artifacts/round5

while [ ! -f artifacts/round5/TPU_QUEUE7_DONE ]; do sleep 60; done

run_imp() {  # run_imp <tag> <model> <hdim> <nlayers>
  local tag=$1 model=$2 hdim=$3 nlayers=$4
  echo "=== $tag 60k ($(date -u)) ==="
  python -m ardae_tpu.cli.ivae_ardae --cache experiments/aux-canonical-r5 \
    --experiment "$tag" \
    --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
    --eval-batch-size 1 --m-optimizer adam --m-momentum 0.5 --m-beta1 0.5 \
    --d-optimizer rmsprop --d-momentum 0.5 --d-beta1 0.5 \
    --train-nstd-cdae 1 --train-nz-cdae 625 --train-nz-model 1 \
    --model "$model" --model-z-dim 32 --model-h-dim "$hdim" \
    --model-n-layers "$nlayers" --model-nonlin softplus --model-n-dim 100 \
    --model-clip-z0-logvar none --model-clip-z-logvar none \
    --cdae mlp-grad --cdae-h-dim 256 --cdae-n-layers 5 --cdae-nonlin softplus \
    --cdae-ctx-type hidden1a \
    --m-lr 0.0003 --d-lr 0.0001 --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
    --delta 0.1 --std-scale 100 --num-cdae-updates 1 \
    --epochs 6400 --max-iters 60000 --seed 2 \
    --eval-iws-interval 10000 --iws-samples 1024 \
    --m-weight-avg none --m-weight-avg-start -1 --m-weight-avg-decay 0.998 \
    --log-interval 100 --vis-interval 1000000 --ckpt-interval 10000 \
    --train-mode train 2>&1 | tail -15
  dir=$(ls -d experiments/aux-canonical-r5/"$tag"-* | sort | tail -1)
  echo "--- IWS-256 test re-eval of $dir ---"
  python scripts/eval_iws_checkpoint.py "$dir" \
    --flavor best-checkpoint --dataset dbmnist-val5k --split test \
    --iws-samples 256 --platform axon \
    --model "$model" --model-z-dim 32 --model-h-dim "$hdim" \
    --model-n-layers "$nlayers" \
    --model-nonlin softplus --cdae mlp-grad --cdae-h-dim 256 \
    --cdae-n-layers 5 --cdae-nonlin softplus --cdae-ctx-type hidden1a \
    --m-lr 0.0001 --m-beta1 0.5 --d-momentum 0.5
}

run_base() {  # run_base <tag> <model> <hdim> <nlayers>
  local tag=$1 model=$2 hdim=$3 nlayers=$4
  echo "=== $tag 60k ($(date -u)) ==="
  python -m ardae_tpu.cli.vae --cache experiments/aux-canonical-r5 \
    --experiment "$tag" \
    --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
    --eval-batch-size 32 --optimizer adam --momentum 0.5 --beta1 0.5 \
    --model "$model" --model-z-dim 32 --model-h-dim "$hdim" \
    --model-n-layers "$nlayers" \
    --model-nonlin softplus --model-n-dim 100 --model-clip-logvar none \
    --lr 0.0003 --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
    --epochs 4700 --max-iters 60000 --seed 2 \
    --eval-iws-interval 5000 --iws-samples 256 \
    --weight-avg none --weight-avg-start -1 --weight-avg-decay 0.998 \
    --log-interval 100 --vis-interval 1000000 --ckpt-interval 10000 \
    --train-mode train 2>&1 | tail -15
}

run_imp imp-auxmnist-ssc100-mlr3e-4-s2 auxmnist 300 2
run_base base-auxmnist-lr3e-4-s2 auxmnist 300 2
run_imp imp-auxconv-ssc100-mlr3e-4-s2 auxconv 0 0
run_base base-auxconv-lr3e-4-s2 auxconv 0 0

echo "=== queue8 done ($(date -u)) ==="
touch artifacts/round5/TPU_QUEUE8_DONE
