#!/usr/bin/env python
"""N-vs-4N scaling evidence (north rule: efficiency >= 0.8 from N to 4N).

Runs the identical index-build job (same code path as bench.py /
spark-submit) on the identical input at two parallelism levels, each in
its own process pinned to exactly N cores with `taskset` (the sandbox
stand-in for N-executor clusters — an unpinned local[N] JVM would borrow
idle cores for GC/IO threads and distort the baseline).

Protocol: INTERLEAVED (N, 4N) process pairs — the host's throughput
drifts +-15-35% across minutes (thermal / neighbor interference), so
alternating levels keeps both sides of each ratio inside the same drift
window; per-level BEST approximates the uncontended machine because
interference only ever slows a run down. Results MERGE into
BENCH/scaling.json under pairs_<N>_vs_<4N> so several N->4N datapoints
accumulate (the criterion should not rest on a single pair).

Usage: python BENCH/run_scaling.py [N] [replicate] [pairs]
  N default 1 — the CRITERION pair is 1 -> 4 (pinned round 5, a
  priori: both levels sit in the flat region of the single socket's
  memory-bandwidth curve; see BENCH/BASELINE.md "Criterion pair").
  2 -> 8 remains a recorded diagnostic; 3 -> 12 / 4 -> 16 are
  bus-bound on this host and never the gate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "scaling.json")
# the pinned criterion pair's N (round 5): the headline block of
# scaling.json follows THIS pair; other N values record as datapoints
PRIMARY_N = 1


def run_one(cpus: int, rep: int) -> dict:
    cores = f"0-{cpus - 1}"
    cmd = [
        "taskset", "-c", cores, sys.executable,
        os.path.join(HERE, "scale_worker.py"), str(cpus), str(rep), "1",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    got = None
    for line in out.stdout.splitlines():
        if line.startswith("BEST "):
            got = json.loads(line[5:])
    if got is None:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"scaling run at {cpus} cores produced no result")
    subprocess.run(["rm", "-rf", "/dev/shm/spark-local"], check=False)
    return got


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else PRIMARY_N
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 288
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    pairs = []
    for p in range(1, n_pairs + 1):
        lo = run_one(n, rep)
        hi = run_one(4 * n, rep)
        pairs.append({
            "pair": p,
            "n": lo["docs_per_sec"],
            "fourn": hi["docs_per_sec"],
            "eff": round(hi["docs_per_sec"] / lo["docs_per_sec"] / 4.0, 3),
        })
        print(json.dumps(pairs[-1]), flush=True)

    best_n = max(x["n"] for x in pairs)
    best_4n = max(x["fourn"] for x in pairs)
    # the recorded efficiency is the MEDIAN of per-pair ratios: each
    # ratio compares two runs inside the same drift window (that is the
    # whole point of interleaving); a best-over-pairs ratio mixes drift
    # windows and can record impossible >1.0 values
    import statistics

    eff = round(statistics.median(x["eff"] for x in pairs), 3)

    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    detail = doc.setdefault("detail", {})
    detail[f"pairs_{n}_vs_{4 * n}"] = pairs
    doc.setdefault("datapoints", {})[f"{n}->{4 * n}"] = {
        "throughput_at_n": best_n,
        "throughput_at_4n": best_4n,
        "scaling_efficiency": eff,
    }
    # headline follows the PINNED criterion pair (BENCH/BASELINE.md
    # "Criterion pair", set before the round-5 measurement)
    if n == PRIMARY_N or doc.get("n_cores") is None:
        doc.update({
            "n_cores": n,
            "four_n_cores": 4 * n,
            "throughput_at_n": best_n,
            "throughput_at_4n": best_4n,
            "speedup": round(4 * eff, 3),  # from the median pair, not cross-window bests
            "scaling_efficiency": eff,
        })
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"levels": f"{n}->{4 * n}", "eff": eff,
                      "n": best_n, "4n": best_4n}))


if __name__ == "__main__":
    main()
