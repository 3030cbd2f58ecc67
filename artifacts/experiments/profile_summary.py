"""Regenerate artifacts/profile_trace/summary.json from the committed
jax.profiler device trace.

Fixes the r4 double-count (VERDICT r4 weak 4): the old ad-hoc aggregation
summed the "XLA Modules" thread (the parent ``jit_run`` envelope spanning
all of its child fusions) TOGETHER with the "XLA Ops" thread (the fusions
themselves), so ``total_device_us`` read 2x the true device time (75.0 ms /
3.75 ms-per-solve vs the correct 37.5 ms / 1.88 ms the prose in
tpu_bench_r4.md reads off the same trace). Per-op totals now come from the
"XLA Ops" thread only; the module envelope is reported separately as the
cross-check (the two agree to the small gaps between ops).

Usage: python artifacts/experiments/profile_summary.py [trace_dir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "..", "profile_trace")
N_SOLVES = int(os.environ.get("PROFILE_N_SOLVES", 20))


def main():
    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {TRACE_DIR}")
    d = json.load(gzip.open(paths[-1], "rt"))
    ev = d["traceEvents"]

    # Map (pid, tid) -> thread name; find the device pid and its two threads.
    tnames = {}
    pnames = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
    dev_pids = {p for p, n in pnames.items() if "TPU" in n or "device" in n.lower()}

    ops = collections.defaultdict(lambda: [0.0, 0])      # XLA Ops (children)
    modules = collections.defaultdict(lambda: [0.0, 0])  # XLA Modules (parents)
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        kind = tnames.get((e["pid"], e["tid"]), "")
        tgt = ops if kind == "XLA Ops" else modules if kind == "XLA Modules" else None
        if tgt is None:
            continue
        rec = tgt[e["name"]]
        rec[0] += e.get("dur", 0.0)
        rec[1] += 1

    total_ops = sum(v[0] for v in ops.values())
    total_modules = sum(v[0] for v in modules.values())
    top = sorted(ops.items(), key=lambda kv: -kv[1][0])[:14]
    out = {
        "note": (
            f"TPU device time over {N_SOLVES} chained headline solves (us). "
            "per_solve_ms = the MODULE ENVELOPE / solves (the wall-clock the "
            "device spent executing the program; the r4 summary double-counted "
            "this envelope into the op sum). ops_sum_us can EXCEED the envelope "
            "when the scheduler overlaps ops (overlap_factor > 1 = concurrency, "
            "not double counting); top_ops are the 'XLA Ops' thread only."
        ),
        "per_solve_ms": round(total_modules / N_SOLVES / 1e3, 3),
        "module_envelope_us": round(total_modules, 1),
        "ops_sum_us": round(total_ops, 1),
        "overlap_factor": round(total_ops / max(total_modules, 1e-9), 2),
        "top_ops": [
            {
                "name": name,
                "total_us": round(t, 1),
                "count": c,
                "pct_of_ops": round(100.0 * t / total_ops, 1),
            }
            for name, (t, c) in top
        ],
    }
    dst = os.path.join(TRACE_DIR, "summary.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}: module envelope {total_modules/1e3:.2f} ms "
          f"({out['per_solve_ms']} ms/solve), ops sum {total_ops/1e3:.2f} ms "
          f"(overlap x{out['overlap_factor']})")


if __name__ == "__main__":
    main()
