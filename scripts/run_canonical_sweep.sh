#!/bin/bash
# Canonical-sweep runner: executes the reference's canonical experiment lines
# (scripts/run_vae_{dbmnist,sbmnist}.sh) sequentially with sweep-wide override
# flags, writing per-config logs. This is the committed form of the round-1
# _tmp_run_queue*.sh knowledge (VERDICT r1, weak #7): the VALIDATION.md
# full-scale numbers were produced by exactly these line+override pairs.
#
# Usage:
#   scripts/run_canonical_sweep.sh [dbmnist|sbmnist|all] [extra flags...]
#
# Notes:
# - Runs SEQUENTIALLY: two TPU processes serialize on one chip; chain, don't
#   parallelize.
# - Non-aux ivae configs run bf16 both phases (quality == fp32 at full scale,
#   VALIDATION.md). Aux ivae configs run fp32: the sigma-collapse regime
#   NaN'd under the round-1 bf16 path; the split-precision DSM loss
#   (fp32 sigma*score product) is expected to survive — validate with
#   --cdae-compute-dtype bfloat16 explicitly before flipping the default.
# - Results land under experiments/dbmnist-v3 / experiments/sbmnist-v3
#   (v3 = current surrogate; pre-v3 dirs are stale, CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
WHICH="${1:-dbmnist}"; shift || true
EXTRA="$*"
LOGDIR=experiments/sweep-logs; mkdir -p "$LOGDIR"

run_line () {  # $1=script $2=line-no $3=tag $4=per-config flags
  CMD=$(sed -n "${2}p" "$1" \
        | sed 's#experiments/dbmnist-val5k#experiments/dbmnist-v3#' \
        | sed 's#experiments/sbmnist#experiments/sbmnist-v3#')
  echo "=== [$3] $CMD $4 $EXTRA"
  eval "$CMD $4 $EXTRA" > "$LOGDIR/$3.log" 2>&1 \
    || echo "!!! [$3] FAILED (see $LOGDIR/$3.log)"
}

# 60k iters reproduces the VALIDATION.md quality table at ~1/6 the reference
# epoch budget; IWS-256 eval every 5k with best-checkpointing.
COMMON="--seed 1 --eval-batch-size 128 --max-iters 60000 --eval-iws-interval 5000 --iws-samples 256 --log-interval 1000 --vis-interval 1000000 --ckpt-interval 5000"
BF16="--cdae-compute-dtype bfloat16 --model-compute-dtype bfloat16"
BF16_VAE="--model-compute-dtype bfloat16"

if [ "$WHICH" = dbmnist ] || [ "$WHICH" = all ]; then
  S=scripts/run_vae_dbmnist.sh
  # proposed (ivae) configs — slow ones first
  run_line $S 35 ivae_resconvct_res "$COMMON $BF16"
  run_line $S 38 ivae_auxresconvct  "$COMMON"
  run_line $S 41 ivae_conv          "$COMMON $BF16"
  run_line $S 44 ivae_auxconv       "$COMMON"
  run_line $S 47 ivae_mnist_concat  "$COMMON $BF16"
  run_line $S 50 ivae_auxmnist      "$COMMON"
  # Gaussian baselines (vae driver)
  run_line $S 16 vae_resconv        "$COMMON $BF16_VAE"
  run_line $S 19 vae_auxresconv     "$COMMON"
  run_line $S 22 vae_conv           "$COMMON $BF16_VAE"
  run_line $S 25 vae_auxconv        "$COMMON"
  run_line $S 28 vae_mnist          "$COMMON $BF16_VAE"
  run_line $S 31 vae_auxmnist       "$COMMON"
fi

if [ "$WHICH" = sbmnist ] || [ "$WHICH" = all ]; then
  S=scripts/run_vae_sbmnist.sh
  COMMON_SB="--seed 1 --eval-batch-size 128 --max-iters 100000 --eval-iws-interval 5000 --iws-samples 256 --log-interval 1000 --vis-interval 1000000 --ckpt-interval 5000"
  run_line $S 13 sb_ivae_resconvct_res "$COMMON_SB $BF16"
  run_line $S 15 sb_ivae_auxresconvct  "$COMMON_SB"
  run_line $S 8  sb_vae_resconv        "$COMMON_SB $BF16_VAE"
  run_line $S 10 sb_vae_auxresconv     "$COMMON_SB"
fi

echo "sweep ($WHICH) complete"
