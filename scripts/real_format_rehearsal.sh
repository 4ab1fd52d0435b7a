#!/bin/bash
# Real-format end-to-end dress rehearsal (round-1 VERDICT item 7): generate
# FULL-SIZE idx/amat files from the surrogate, point --data-root at them, and
# run a short CLI training + IWS eval for dbmnist AND sbmnist, so the day the
# real MNIST files arrive the whole path (parse -> split cache -> HBM ->
# binarize -> train -> eval) is known-good at scale.
#
# Usage: scripts/real_format_rehearsal.sh [root=/tmp/real-format-rehearsal]
set -eu
cd "$(dirname "$0")/.."
ROOT="${1:-/tmp/real-format-rehearsal}"
mkdir -p "$ROOT"

echo "== generating full-size idx + amat files under $ROOT/data"
python scripts/make_real_format_files.py "$ROOT/data"

COMMON="--nheight 28 --nchannels 1 --train-batch-size 128 --m-optimizer adam \
 --m-beta1 0.5 --d-optimizer rmsprop --d-momentum 0.5 --train-nz-cdae 625 \
 --train-nz-model 1 --model mnist-conv --model-z-dim 32 --model-h-dim 0 \
 --model-n-layers 0 --model-nonlin softplus --model-n-dim 100 --cdae mlp-grad \
 --cdae-h-dim 256 --cdae-n-layers 5 --cdae-nonlin softplus --cdae-ctx-type lt0 \
 --m-lr 0.0001 --d-lr 0.0001 --delta 0.1 --std-scale 10000 --epochs 6400 \
 --max-iters 300 --eval-iws-interval 300 --iws-samples 64 --eval-batch-size 128 \
 --log-interval 100 --vis-interval 1000000 --ckpt-interval 300 \
 --cdae-compute-dtype bfloat16 --model-compute-dtype bfloat16 \
 --data-root $ROOT/data --cache $ROOT/experiments"

echo "== dbmnist-val5k: 300 joint steps + IWS-64 eval on real idx files"
python -m ardae_tpu.cli.ivae_ardae --dataset dbmnist-val5k $COMMON --exp-num 90
grep -q "real files from" "$ROOT"/experiments/*nzm1-90-*/log.txt \
  && echo "   [ok] trained on REAL-FORMAT idx files"

echo "== sbmnist: 300 joint steps + IWS-64 eval on real amat files"
python -m ardae_tpu.cli.ivae_ardae --dataset sbmnist $COMMON --exp-num 91
grep -q "real files from" "$ROOT"/experiments/*nzm1-91-*/log.txt \
  && echo "   [ok] trained on REAL-FORMAT amat files"

echo "rehearsal complete"
