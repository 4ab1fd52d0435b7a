#!/bin/bash
# Round-5 TPU aux queue #3 — transfer test for the ssc100 finding on the
# OTHER tie row of the v3 sweep table (auxconv: baseline -82.26 vs implicit
# -82.40, a -0.14 tie at canonical flags). Same protocol as queue #1/#2:
# the EXACT canonical run_vae_dbmnist.sh auxconv lines with one searched
# reference-legal knob per side (implicit std-scale 10000->100, baseline
# lr 1e-4->3e-4), plus an IWS-256 re-eval of the implicit best checkpoint
# for same-sample-count comparability with the old IWS-256 sweep rows.
# Waits for queue #2 (serial TPU occupancy).
cd "$(dirname "$0")/../.." || exit 1
export PYTHONUNBUFFERED=1
mkdir -p artifacts/round5

while [ ! -f artifacts/round5/TPU_QUEUE2_DONE ]; do sleep 60; done

echo "=== implicit auxconv ssc100 60k ($(date -u)) ==="
python -m ardae_tpu.cli.ivae_ardae --cache experiments/aux-canonical-r5 \
  --experiment imp-auxconv-ssc100 \
  --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
  --eval-batch-size 1 --m-optimizer adam --m-momentum 0.5 --m-beta1 0.5 \
  --d-optimizer rmsprop --d-momentum 0.5 --d-beta1 0.5 \
  --train-nstd-cdae 1 --train-nz-cdae 625 --train-nz-model 1 \
  --model auxconv --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
  --model-nonlin softplus --model-n-dim 100 \
  --model-clip-z0-logvar none --model-clip-z-logvar none \
  --cdae mlp-grad --cdae-h-dim 256 --cdae-n-layers 5 --cdae-nonlin softplus \
  --cdae-ctx-type hidden1a \
  --m-lr 0.0001 --d-lr 0.0001 --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
  --delta 0.1 --std-scale 100 --num-cdae-updates 1 \
  --epochs 6400 --max-iters 60000 --seed 1 \
  --eval-iws-interval 10000 --iws-samples 1024 \
  --m-weight-avg none --m-weight-avg-start -1 --m-weight-avg-decay 0.998 \
  --log-interval 100 --vis-interval 1000000 --ckpt-interval 10000 \
  --train-mode train 2>&1 | tail -15

dir=$(ls -d experiments/aux-canonical-r5/imp-auxconv-ssc100-* | sort | tail -1)
echo "--- IWS-256 test re-eval of $dir ---"
python scripts/eval_iws_checkpoint.py "$dir" \
  --flavor best-checkpoint --dataset dbmnist-val5k --split test \
  --iws-samples 256 --platform axon \
  --model auxconv --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
  --model-nonlin softplus --cdae mlp-grad --cdae-h-dim 256 \
  --cdae-n-layers 5 --cdae-nonlin softplus --cdae-ctx-type hidden1a \
  --m-lr 0.0001 --m-beta1 0.5 --d-momentum 0.5

echo "=== baseline vae auxconv lr3e-4 60k ($(date -u)) ==="
python -m ardae_tpu.cli.vae --cache experiments/aux-canonical-r5 \
  --experiment base-auxconv-lr3e-4 \
  --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
  --eval-batch-size 32 --optimizer adam --momentum 0.5 --beta1 0.5 \
  --model auxconv --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
  --model-nonlin softplus --model-n-dim 100 --model-clip-logvar none \
  --lr 0.0003 --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
  --epochs 4700 --max-iters 60000 --seed 1 \
  --eval-iws-interval 5000 --iws-samples 256 \
  --weight-avg none --weight-avg-start -1 --weight-avg-decay 0.998 \
  --log-interval 100 --vis-interval 1000000 --ckpt-interval 10000 \
  --train-mode train 2>&1 | tail -15

echo "=== queue3 done ($(date -u)) ==="
touch artifacts/round5/TPU_QUEUE3_DONE
