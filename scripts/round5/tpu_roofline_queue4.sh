#!/bin/bash
# Round-5 TPU queue #4 — durable roofline evidence (VERDICT r4 weak #1).
# BASELINE.md's "measured AT the HBM roofline" claim was captured in round 2
# with the raw traces/analysis in /tmp (wiped between rounds). Re-capture
# both bench configs on the live chip with the committed, tested tool and
# commit the analysis text under artifacts/round5/. Waits for queue #3.
cd "$(dirname "$0")/../.." || exit 1
export PYTHONUNBUFFERED=1
mkdir -p artifacts/round5

while [ ! -f artifacts/round5/TPU_QUEUE3_DONE ]; do sleep 60; done

for cfg in flagship primary; do
  echo "=== roofline capture: $cfg ($(date -u)) ==="
  python scripts/trace_roofline.py /tmp/prof_r5_$cfg --capture 200 \
    --config $cfg 2>&1 | grep -v "^WARNING" \
    | tee artifacts/round5/roofline_$cfg.txt
done

echo "=== queue4 done ($(date -u)) ==="
touch artifacts/round5/TPU_QUEUE4_DONE
