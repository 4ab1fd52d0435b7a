#!/bin/bash
# Round-5 TPU tunnel watcher (VERDICT r4 items 1 + 8).
#
# The axon tunnel was dead for all of rounds 2-4 (BENCH_r02..r04 red); a dead
# tunnel makes jax.devices() HANG rather than fail (CLAUDE.md), so every probe
# runs under a hard timeout. On first success this script:
#   1. stamps artifacts/round5/TPU_UP,
#   2. captures `python bench.py` into BENCH_LOCAL.json (the 3-row/MFU/HBM
#      format with captured_at — the artifact VERDICT r4 item 1a asks for),
#   3. runs the canonical 60k-iter aux pair queue (tpu_aux_queue.sh — VERDICT
#      r4 item 1b, the decisive auxmnist ssc100 sweep-table row).
# The session commits the artifacts when it sees the stamp files.
cd "$(dirname "$0")/../.." || exit 1
mkdir -p artifacts/round5
while true; do
  if timeout 240 python -c "
import jax
d = jax.devices()
print('backend up:', d)
print(float(jax.numpy.ones(4).sum()))
" >> artifacts/round5/tpu_probe.log 2>&1; then
    date -u +"%Y-%m-%dT%H:%M:%SZ" > artifacts/round5/TPU_UP
    break
  fi
  echo "$(date -u +%H:%M:%SZ) probe failed/hung" >> artifacts/round5/tpu_probe.log
  sleep 600
done
python bench.py > BENCH_LOCAL.json 2> artifacts/round5/bench_stderr.log
cp BENCH_LOCAL.json artifacts/round5/ 2>/dev/null
touch artifacts/round5/BENCH_DONE
bash scripts/round5/tpu_aux_queue.sh > artifacts/round5/tpu_aux_queue.log 2>&1
touch artifacts/round5/TPU_QUEUE_DONE
