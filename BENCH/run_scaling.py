#!/usr/bin/env python
"""N-vs-4N scaling evidence (north rule: efficiency >= 0.8 from N to 4N).

Runs the identical index-build job (same code path as bench.py /
spark-submit) on the identical input at two parallelism levels, each in
its own process pinned to exactly N cores with `taskset` (the sandbox
stand-in for N-executor clusters — an unpinned local[N] JVM would borrow
idle cores for GC/IO threads and distort the baseline). Writes
BENCH/scaling.json and regenerates the scaling section of
BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [N] [replicate] [trials]
  N default 4 (so 4N=16; both well inside the box's 32 physical cores
  and its memory-bandwidth envelope)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(cpus: int, rep: int, trials: int) -> dict:
    cores = f"0-{cpus - 1}"
    results = []
    for t in range(trials):
        cmd = [
            "taskset", "-c", cores, sys.executable,
            os.path.join(HERE, "scale_worker.py"), str(cpus), str(rep), "1",
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
        got = None
        for line in out.stdout.splitlines():
            if line.startswith("BEST "):
                got = json.loads(line[5:])
        if got is None:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
            raise RuntimeError(f"scaling run at {cpus} cores produced no result")
        got["trial"] = t
        results.append(got)
        subprocess.run(["rm", "-rf", "/dev/shm/spark-local"], check=False)
    best = min(results, key=lambda r: r["sec"])
    best = dict(best)
    best["trials"] = results
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 288
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lo = run_level(n, rep, trials)
    hi = run_level(4 * n, rep, trials)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    result = {
        "n_cores": n,
        "four_n_cores": 4 * n,
        "n_docs": lo["n_docs"],
        "throughput_at_n": lo["docs_per_sec"],
        "throughput_at_4n": hi["docs_per_sec"],
        "speedup": round(hi["docs_per_sec"] / lo["docs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "detail": {"n": lo, "4n": hi},
    }
    with open(os.path.join(HERE, "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
