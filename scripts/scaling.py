"""Scaling-efficiency evidence (BASELINE.json north rule): the same
pipeline job on the same input at two parallelism levels — local[8] vs
local[32] standing in for N vs 4N executors — reporting docs/sec at both
and efficiency = (throughput_32 / throughput_8) / 4.

Each config runs ``bench.py`` (pipeline-only mode) in a fresh subprocess
R times and takes the best run — the sandbox host has heavy background
load (observed 3-7x wall-clock noise), and best-of-R isolates the
engine's own scaling from host contention.

Usage: python scripts/scaling.py [chains] [repeats] [N] [4N]
(widths default 8 and 32; writes BENCH_SCALING_{N}v{4N}.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, chains: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CHAINS=str(chains),
        SPARK_GRAFT_ONLY="pipeline",
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    chains = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    results: dict[int, dict] = {}
    # interleave widths so host-load drift hits both equally
    for i in range(repeats):
        for cpus in (lo, hi):
            r = run_once(cpus, chains)
            print(f"cpus={cpus} run{i}: {r['value']} docs/sec "
                  f"({r['queries']['pipeline']}s, {r['pages']} pages)", flush=True)
            if cpus not in results or r["value"] > results[cpus]["value"]:
                results[cpus] = r

    thr_lo, thr_hi = results[lo]["value"], results[hi]["value"]
    eff = round((thr_hi / thr_lo) / (hi / lo), 3)
    pages = results[hi]["pages"]

    payload = {
        "chains": chains, "pages": pages, "repeats": repeats,
        "widths": [lo, hi],
        f"thr{lo}": thr_lo, f"thr{hi}": thr_hi, "eff": eff,
        f"wall{lo}": results[lo]["queries"]["pipeline"],
        f"wall{hi}": results[hi]["queries"]["pipeline"],
        "raw": {str(k): v for k, v in results.items()},
    }
    out = os.path.join(REPO, f"BENCH_SCALING_{lo}v{hi}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))
    print(f"\neff={eff} -> {out} written (fold into BENCH.md by hand)")


if __name__ == "__main__":
    main()
