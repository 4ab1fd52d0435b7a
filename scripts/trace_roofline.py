"""Measured HBM roofline from a jax.profiler trace (BASELINE.md "Roofline").

XLA's `cost_analysis()` "bytes accessed" is a pre-schedule HLO estimate and
badly understates real traffic on this workload (see BASELINE.md); the
profiler trace carries the post-schedule per-op `bytes_accessed` the TPU
runtime actually counted. This script makes the round-2 measured-roofline
numbers (19.4 GB/step at 23.6 ms/step = 822 GB/s ~= v5e 819 GB/s peak for
the flagship) reproducible:

  # 1. capture a trace of N steps of the flagship (or any CLI config):
  python -m ardae_tpu.cli.ivae_ardae ... --profile-dir /tmp/prof_flagship
  #    (or: python scripts/trace_roofline.py --capture N  for the bench
  #     flagship config without going through the CLI)
  # 2. analyze it:
  python scripts/trace_roofline.py /tmp/prof_flagship --steps N

Reports total device-op time, total bytes, GB/step, achieved GB/s vs the
819 GB/s v5e public peak, and the top ops by bytes with their individual
achieved bandwidth (near-peak => bandwidth-bound; far below => compute/ALU
bound, e.g. the threefry RNG fusion).
"""

import argparse
import glob
import gzip
import json
import os
import sys

PEAK_HBM_GBPS = 819.0  # TPU v5e public spec


def find_trace(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*trace.json.gz"),
                            recursive=True), key=os.path.getmtime)
    if not hits:
        sys.exit(f"no *trace.json.gz under {path}")
    return hits[-1]


def analyze(trace_path, steps, top):
    with gzip.open(trace_path, "rt") as f:
        events = json.load(f)["traceEvents"]

    busy_us = 0.0
    total_bytes = 0
    t0, t1 = float("inf"), float("-inf")
    per_op = {}
    for e in events:
        args = e.get("args")
        if not args or "device_duration_ps" not in args:
            continue  # host-side / metadata event
        if "hlo_category" not in args:
            # envelope lanes ("Steps", "XLA Modules") carry a single
            # device_duration_ps spanning the whole window with 0 bytes —
            # counting them doubles busy-sum and fakes extra overlap
            continue
        dur_us = float(args["device_duration_ps"]) / 1e6
        nbytes = int(args.get("bytes_accessed", 0))
        busy_us += dur_us
        total_bytes += nbytes
        t0 = min(t0, e["ts"])
        t1 = max(t1, e["ts"] + e["dur"])
        name = e.get("name", "?")
        agg = per_op.setdefault(name, [0.0, 0, 0, args.get("hlo_category", "")])
        agg[0] += dur_us
        agg[1] += nbytes
        agg[2] += 1

    if not per_op:
        sys.exit(f"no device op events in {trace_path} "
                 "(CPU-backend or host-only capture?)")
    # ops overlap on parallel device lanes (busy-sum > wall span); the
    # roofline denominator is the device-track wall span.
    total_s = (t1 - t0) / 1e6
    total_gb = total_bytes / 1e9
    print(f"trace: {trace_path}")
    print(f"device span {total_s*1e3:.1f} ms (busy-sum {busy_us/1e3:.1f} ms, "
          f"overlap x{busy_us/1e3/(total_s*1e3):.1f}), bytes {total_gb:.1f} GB "
          f"over {steps} steps")
    print(f"=> {total_gb/steps:.2f} GB/step at {total_s/steps*1e3:.2f} ms/step "
          f"= {total_gb/total_s:.0f} GB/s avg "
          f"({100*total_gb/total_s/PEAK_HBM_GBPS:.0f}% of v5e "
          f"{PEAK_HBM_GBPS:.0f} GB/s peak)")
    print(f"\ntop {top} ops by total bytes:")
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1][1])[:top]
    for name, (us, nb, count, cat) in ranked:
        bw = nb / 1e9 / (us / 1e6) if us else 0.0
        print(f"  {nb/1e9:7.1f} GB {us/1e3:8.1f} ms {bw:6.0f} GB/s "
              f"x{count:<5d} [{cat}] {name[:60]}")


def capture(n_steps, outdir, config="flagship"):
    """Profile n_steps of a bench config into outdir (needs the TPU; uses
    bench.py's row builders for a program identical to the benchmark)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    import bench

    bench.CHUNK = n_steps
    bench.WARM_CHUNKS = 1
    bench.TIMED_CHUNKS = 1
    bench.REPEATS = 1
    orig_time = bench._time_repeats

    def traced(run_once, sync, n):
        with jax.profiler.trace(outdir):
            return orig_time(run_once, sync, n)

    bench._time_repeats = traced
    if config == "flagship":
        row = bench.bench_ivae(
            "resconvct-res", "mlp-res", h_model=512, n_layers_model=1,
            nonlin_model="elu", h_cdae=512, n_layers_cdae=5,
            num_cdae_updates=2, std_scale=100.0,
            label="flagship (traced)", baseline=0)
    else:  # primary: conv IVAE bf16, the headline bench row
        row = bench.bench_ivae(
            "mnist-conv", "mlp-grad", h_model=0, n_layers_model=0,
            nonlin_model="softplus", h_cdae=256, n_layers_cdae=5,
            num_cdae_updates=1, std_scale=10000.0,
            label="primary (traced)", baseline=0)
    print("captured:", row["label"], row["steps_per_sec"], "steps/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", nargs="?", default="/tmp/prof_flagship",
                    help="profile dir or trace.json.gz file")
    ap.add_argument("--steps", type=int, default=200,
                    help="train steps covered by the trace window")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--capture", type=int, metavar="N",
                    help="first capture an N-step trace into TRACE")
    ap.add_argument("--config", default="flagship",
                    choices=["flagship", "primary"],
                    help="which bench config --capture profiles")
    a = ap.parse_args()
    if a.capture:
        capture(a.capture, a.trace, a.config)
        a.steps = a.capture
    analyze(find_trace(a.trace), a.steps, a.top)
