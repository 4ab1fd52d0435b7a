#!/bin/bash
# Round-5 serialized CPU queue (1-core host — parallel runs only timeshare).
#
# Wave A (VERDICT r4 item 4): all three --m-weight-avg modes at ONE matched
#   budget (6000 iters, same config/seed) — round 4's swa row was confounded
#   by a 2000-iter budget. Re-runs all three arms under one committed config
#   so the comparison is internally consistent.
# Wave B (VERDICT r4 items 2/3): the round-4 queue10 matched-frontier arms,
#   lost at round teardown — implicit at the baseline's frontier lr 1e-3
#   (seeds 1-2), the 2-upd seed-2 arm, and the baseline lr 1e-3 seed 2, all
#   at 7500 iters.
# Wave C (VERDICT r4 item 5): the 15k-iter budget curve — does the implicit
#   2-upd advantage grow / the baseline lr-frontier lead shrink with budget?
#   Ordered so the most decision-relevant cells complete first.
# Results: each run is scored by the committed parity evaluators on the
# shared 500-item rng(1234)-binarized val set; everything appends to
# artifacts/round5/cpu_results.log (the durable ledger, VERDICT r4 item 3).
cd "$(dirname "$0")/../.." || exit 1
source scripts/round5/aux_h2h_common.sh
RES=artifacts/round5/cpu_results.log
mkdir -p artifacts/round5

note() { echo "[$(date -u +%H:%M:%SZ)] $*" | tee -a "$RES"; }

run_wavg() {  # run_wavg <tag> [weight-avg flags...]
  local tag=$1; shift
  python -m ardae_tpu.cli.ivae_ardae \
    --cache experiments/wavg-r5 --experiment "wavg-$tag" \
    --dataset 25gaussians --nheight 1 --nchannels 2 \
    --model mlp-concat --model-z-dim 2 --model-h-dim 64 --model-n-layers 2 \
    --model-nonlin relu --model-n-dim 10 \
    --model-clip-z0-logvar none --model-clip-z-logvar none \
    --cdae mlp-grad --cdae-h-dim 64 --cdae-n-layers 3 --cdae-nonlin softplus \
    --cdae-ctx-type lt0 \
    --train-batch-size 256 --train-nz-cdae 64 --train-nz-model 1 \
    --delta 0.1 --std-scale 10000 --num-cdae-updates 1 \
    --m-lr 0.0001 --m-optimizer adam --m-momentum 0.5 --m-beta1 0.5 \
    --d-lr 0.0001 --d-optimizer rmsprop --d-momentum 0.5 --d-beta1 0.5 \
    --epochs 16 --max-iters 6000 --seed 1 --no-cuda \
    --eval-iws-interval 1500 --iws-samples 64 \
    --log-interval 500 --vis-interval 1000000 --ckpt-interval 6000 \
    --skip-final-test-eval --train-mode train "$@" > /dev/null 2>&1
  note "wavg-$tag final evals:"
  grep "| val" "$(ls -d experiments/wavg-r5/wavg-$tag-* | sort | tail -1)/log.txt" \
    | tee -a "$RES"
}

imp() {  # imp <mlr> <upd> <seed> <iters> <tag>
  note "START imp $*"
  run_implicit "$1" "$2" "$3" "$4" "$5" > /dev/null 2>&1
  note "imp $5 eval:"
  eval_implicit "$5" 2>/dev/null | grep -E "OURS|loaded" | tee -a "$RES"
}
base() {  # base <lr> <seed> <iters> <tag>
  note "START base $*"
  run_baseline "$1" "$2" "$3" "$4" > /dev/null 2>&1
  note "base $4 eval:"
  eval_baseline "$4" "$1" 2>/dev/null | grep -E "BASELINE|loaded" | tee -a "$RES"
}

note "=== Wave A: weight-avg matched budget (6000 iters, seed 1) ==="
run_wavg none  --m-weight-avg none
run_wavg polyak --m-weight-avg polyak --m-weight-avg-start 3000 \
  --m-weight-avg-decay 0.998
run_wavg swa   --m-weight-avg swa --m-weight-avg-start 1000
touch artifacts/round5/WAVE_A_DONE

note "=== Wave B: queue10 matched-frontier arms (7500 iters) ==="
imp 0.001  1 1 7500 mlr1e-3-s1-7k5
imp 0.001  1 2 7500 mlr1e-3-s2-7k5
imp 0.0003 2 2 7500 mlr3e-4-2upd-s2-7k5
base 0.001 2 7500 lr1e-3-s2-7k5
touch artifacts/round5/WAVE_B_DONE

note "=== Wave C: 15k budget curve ==="
imp 0.0003 2 1 15000 mlr3e-4-2upd-s1-15k
base 0.001 1 15000 lr1e-3-s1-15k
imp 0.0003 1 1 15000 mlr3e-4-1upd-s1-15k
base 0.0003 1 15000 lr3e-4-s1-15k
imp 0.001  1 1 15000 mlr1e-3-s1-15k
imp 0.0003 2 2 15000 mlr3e-4-2upd-s2-15k
base 0.001 2 15000 lr1e-3-s2-15k
imp 0.0003 1 2 15000 mlr3e-4-1upd-s2-15k
base 0.0003 2 15000 lr3e-4-s2-15k
imp 0.001  1 2 15000 mlr1e-3-s2-15k
touch artifacts/round5/WAVE_C_DONE
note "=== CPU queue complete ==="
