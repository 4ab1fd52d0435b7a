#!/bin/bash
# Round-5 TPU aux queue #2 — closes the lr confound left by tpu_aux_queue.sh.
#
# Queue #1 result (artifacts/round5/tpu_aux_queue.log): at canonical budget
# (60k, bs=128, nz=625) implicit auxmnist ssc100 @ canonical m-lr 1e-4 scored
# test IWS-1024 -77.70 vs the Gaussian baseline @ searched lr 3e-4 at
# IWS-256 -75.01. Two confounds remain:
#   (a) evaluator sample count (1024 vs 256, both canonical — the reference's
#       own lines differ this way): re-evaluate the implicit best checkpoint
#       at IWS-256 with the committed standalone evaluator.
#   (b) lr: the implicit arm never got the baseline's winning lr. Run the
#       matched-lr cell (implicit ssc100 @ m-lr 3e-4) and, reference-legal
#       per the aux resconvct canonical lines, a 2-cdae-updates arm
#       (round-4 reduced-scale: 2-upd flipped seed 1 to an implicit win).
# Everything appends to artifacts/round5/tpu_aux_queue2.log via the caller.
cd "$(dirname "$0")/../.." || exit 1
export PYTHONUNBUFFERED=1
mkdir -p artifacts/round5

eval256() {  # eval256 <exp_glob>
  local dir
  dir=$(ls -d $1 | sort | tail -1)
  echo "--- IWS-256 test re-eval of $dir ---"
  python scripts/eval_iws_checkpoint.py "$dir" \
    --flavor best-checkpoint --dataset dbmnist-val5k --split test \
    --iws-samples 256 --platform axon \
    --model auxmnist --model-z-dim 32 --model-h-dim 300 --model-n-layers 2 \
    --model-nonlin softplus --cdae mlp-grad --cdae-h-dim 256 \
    --cdae-n-layers 5 --cdae-nonlin softplus --cdae-ctx-type hidden1a \
    --m-lr 0.0001 --m-beta1 0.5 --d-momentum 0.5
}

run_imp() {  # run_imp <tag> <mlr> <nupd>
  echo "=== implicit auxmnist ssc100 $1 60k ($(date -u)) ==="
  python -m ardae_tpu.cli.ivae_ardae --cache experiments/aux-canonical-r5 \
    --experiment "imp-auxmnist-ssc100-$1" \
    --dataset dbmnist-val5k --nheight 28 --nchannels 1 --train-batch-size 128 \
    --eval-batch-size 1 --m-optimizer adam --m-momentum 0.5 --m-beta1 0.5 \
    --d-optimizer rmsprop --d-momentum 0.5 --d-beta1 0.5 \
    --train-nstd-cdae 1 --train-nz-cdae 625 --train-nz-model 1 \
    --model auxmnist --model-z-dim 32 --model-h-dim 300 --model-n-layers 2 \
    --model-nonlin softplus --model-n-dim 100 \
    --model-clip-z0-logvar none --model-clip-z-logvar none \
    --cdae mlp-grad --cdae-h-dim 256 --cdae-n-layers 5 --cdae-nonlin softplus \
    --cdae-ctx-type hidden1a \
    --m-lr "$2" --d-lr 0.0001 --beta-init 1.0 --beta-fin 1.0 --beta-annealing 0 \
    --delta 0.1 --std-scale 100 --num-cdae-updates "$3" \
    --epochs 6400 --max-iters 60000 --seed 1 \
    --eval-iws-interval 10000 --iws-samples 1024 \
    --m-weight-avg none --m-weight-avg-start -1 --m-weight-avg-decay 0.998 \
    --log-interval 100 --vis-interval 1000000 --ckpt-interval 10000 \
    --train-mode train 2>&1 | tail -15
}

eval256 "experiments/aux-canonical-r5/imp-auxmnist-ssc100-2608*"

run_imp mlr3e-4 0.0003 1
eval256 "experiments/aux-canonical-r5/imp-auxmnist-ssc100-mlr3e-4-*"

run_imp 2upd 0.0001 2
eval256 "experiments/aux-canonical-r5/imp-auxmnist-ssc100-2upd-*"

echo "=== queue2 done ($(date -u)) ==="
touch artifacts/round5/TPU_QUEUE2_DONE
