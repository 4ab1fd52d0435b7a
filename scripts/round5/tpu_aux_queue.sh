#!/bin/bash
# Canonical-budget aux pair (VERDICT r4 item 1b / r3 item 1): the decisive
# auxmnist sweep-table row. Both arms are the EXACT canonical
# run_vae_dbmnist.sh auxmnist lines (mirrored in scripts/run_vae_dbmnist.sh)
# with ONE searched reference-legal knob each, capped at the sweep's 60k
# iters (CLAUDE.md: run aux configs fp32):
#   implicit: --std-scale 100   (round-4 search: +10 nats at reduced scale;
#             reference-reproduced; the reference's own auxresconvct lines
#             use std-scale 100)
#   baseline: --lr 3e-4         (its own searched winning knob)
# Comparison metric: test IWS from best checkpoint, like the v3 sweep table.
cd "$(dirname "$0")/../.." || exit 1
export PYTHONUNBUFFERED=1
mkdir -p artifacts/round5

echo "=== implicit auxmnist ssc100 60k ($(date -u)) ==="
python -m ardae_tpu.cli.ivae_ardae --cache experiments/aux-canonical-r5 \
  --experiment imp-auxmnist-ssc100 \
  --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
  --eval-batch-size 1 --m-optimizer adam --m-momentum 0.5 --m-beta1 0.5 \
  --d-optimizer rmsprop --d-momentum 0.5 --d-beta1 0.5 \
  --train-nstd-cdae 1 --train-nz-cdae 625 --train-nz-model 1 \
  --model auxmnist --model-z-dim 32 --model-h-dim 300 --model-n-layers 2 \
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
  --train-mode train 2>&1 | tail -40

echo "=== baseline vae auxmnist lr3e-4 60k ($(date -u)) ==="
python -m ardae_tpu.cli.vae --cache experiments/aux-canonical-r5 \
  --experiment base-auxmnist-lr3e-4 \
  --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
  --eval-batch-size 32 --optimizer adam --momentum 0.5 --beta1 0.5 \
  --model auxmnist --model-z-dim 32 --model-h-dim 300 --model-n-layers 2 \
  --model-nonlin softplus --model-n-dim 100 --model-clip-logvar none \
  --lr 0.0003 --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
  --epochs 4700 --max-iters 60000 --seed 1 \
  --eval-iws-interval 5000 --iws-samples 256 \
  --weight-avg none --weight-avg-start -1 --weight-avg-decay 0.998 \
  --log-interval 100 --vis-interval 1000000 --ckpt-interval 10000 \
  --train-mode train 2>&1 | tail -40

echo "=== done ($(date -u)) ==="
