#!/bin/bash
# Round-5 TPU aux queue #6 — the symmetric lr cell for the auxconv pair.
# Queue #3 flipped the matched-lr auxconv sweep row (implicit ssc100
# -80.10 IWS-256 vs canonical baseline -82.26) but left the same lr
# confound queue #2 closed for auxmnist: the baseline's searched-lr arm
# (-75.95) was compared against an implicit arm still at canonical
# m-lr 1e-4. Run implicit auxconv ssc100 at m-lr 3e-4 (the knob that
# moved auxmnist +3.4 nats) so the both-sides-searched comparison is
# confound-free. Waits for queue #5.
cd "$(dirname "$0")/../.." || exit 1
export PYTHONUNBUFFERED=1
mkdir -p artifacts/round5

while [ ! -f artifacts/round5/TPU_QUEUE5_DONE ]; do sleep 60; done

echo "=== implicit auxconv ssc100 mlr3e-4 60k ($(date -u)) ==="
python -m ardae_tpu.cli.ivae_ardae --cache experiments/aux-canonical-r5 \
  --experiment imp-auxconv-ssc100-mlr3e-4 \
  --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
  --eval-batch-size 1 --m-optimizer adam --m-momentum 0.5 --m-beta1 0.5 \
  --d-optimizer rmsprop --d-momentum 0.5 --d-beta1 0.5 \
  --train-nstd-cdae 1 --train-nz-cdae 625 --train-nz-model 1 \
  --model auxconv --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
  --model-nonlin softplus --model-n-dim 100 \
  --model-clip-z0-logvar none --model-clip-z-logvar none \
  --cdae mlp-grad --cdae-h-dim 256 --cdae-n-layers 5 --cdae-nonlin softplus \
  --cdae-ctx-type hidden1a \
  --m-lr 0.0003 --d-lr 0.0001 --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
  --delta 0.1 --std-scale 100 --num-cdae-updates 1 \
  --epochs 6400 --max-iters 60000 --seed 1 \
  --eval-iws-interval 10000 --iws-samples 1024 \
  --m-weight-avg none --m-weight-avg-start -1 --m-weight-avg-decay 0.998 \
  --log-interval 100 --vis-interval 1000000 --ckpt-interval 10000 \
  --train-mode train 2>&1 | tail -15

dir=$(ls -d experiments/aux-canonical-r5/imp-auxconv-ssc100-mlr3e-4-* | sort | tail -1)
echo "--- IWS-256 test re-eval of $dir ---"
python scripts/eval_iws_checkpoint.py "$dir" \
  --flavor best-checkpoint --dataset dbmnist-val5k --split test \
  --iws-samples 256 --platform axon \
  --model auxconv --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
  --model-nonlin softplus --cdae mlp-grad --cdae-h-dim 256 \
  --cdae-n-layers 5 --cdae-nonlin softplus --cdae-ctx-type hidden1a \
  --m-lr 0.0001 --m-beta1 0.5 --d-momentum 0.5

echo "=== queue6 done ($(date -u)) ==="
touch artifacts/round5/TPU_QUEUE6_DONE
