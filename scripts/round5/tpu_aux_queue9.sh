#!/bin/bash
# Round-5 TPU aux queue #9 — seed-2 arms for the auxresconvct collapse
# pair, completing n=2 on BOTH sides of every decisive aux cell:
#   arm A: baseline auxresconv VAE, lr 3e-4, seed 2 (queue7 arm C was
#          seed 1 — the searched-lr baseline side of the collapse pair).
#   arm B: auxresconvct UNCLIPPED, fp32, m-lr 3e-4, seed 2 (queue7 arm A
#          was seed 1 — replicates "the clip is not load-bearing").
# Waits for queue #8 (serial TPU occupancy).
cd "$(dirname "$0")/../.." || exit 1
export PYTHONUNBUFFERED=1
mkdir -p artifacts/round5

while [ ! -f artifacts/round5/TPU_QUEUE8_DONE ]; do sleep 60; done

echo "=== baseline auxresconv lr3e-4 seed2 60k ($(date -u)) ==="
python -m ardae_tpu.cli.vae --cache experiments/aux-canonical-r5 \
  --experiment base-auxresconv-lr3e-4-s2 \
  --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
  --eval-batch-size 32 --optimizer adam --momentum 0.9 --beta1 0.9 \
  --model auxresconv --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
  --model-nonlin elu --model-n-dim 100 --model-clip-logvar none \
  --lr 0.0003 --beta-init 0.0001 --beta-fin 1.0 --beta-annealing 0 \
  --epochs 6400 --max-iters 60000 --seed 2 \
  --eval-iws-interval 5000 --iws-samples 256 \
  --weight-avg none --weight-avg-start -1 --weight-avg-decay 0.998 \
  --log-interval 100 --vis-interval 1000000 --ckpt-interval 5000 \
  --train-mode train 2>&1 | tail -20

echo "=== arc UNCLIPPED fp32 mlr3e-4 seed2 60k ($(date -u)) ==="
python -m ardae_tpu.cli.ivae_ardae --cache experiments/aux-canonical-r5 \
  --experiment arc-mlr3e-4-fp32-s2 \
  --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
  --eval-batch-size 1 --m-optimizer adam --m-momentum 0.9 --m-beta1 0.9 \
  --d-optimizer rmsprop --d-momentum 0.9 --d-beta1 0.9 \
  --train-nstd-cdae 1 --train-nz-cdae 625 --train-nz-model 1 \
  --model auxresconvct --model-z-dim 32 --model-h-dim 0 --model-n-layers 0 \
  --model-nonlin elu --model-n-dim 100 \
  --model-clip-z0-logvar none --model-clip-z-logvar none \
  --cdae mlp-res --cdae-h-dim 512 --cdae-n-layers 5 --cdae-nonlin softplus \
  --cdae-ctx-type hidden1a \
  --m-lr 0.0003 --d-lr 0.0001 \
  --beta-init 0.0001 --beta-fin 1.0 --beta-annealing 50000 \
  --delta 0.1 --std-scale 100 --num-cdae-updates 2 \
  --epochs 6400 --max-iters 60000 --seed 2 \
  --eval-iws-interval 10000 --iws-samples 256 \
  --m-weight-avg none --m-weight-avg-start -1 --m-weight-avg-decay 0.998 \
  --log-interval 100 --vis-interval 1000000 --ckpt-interval 5000 \
  --train-mode train 2>&1 | tail -20

echo "=== queue9 done ($(date -u)) ==="
touch artifacts/round5/TPU_QUEUE9_DONE
