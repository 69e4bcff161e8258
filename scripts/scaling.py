"""Scaling-efficiency evidence (BASELINE.json north rule): the same
pipeline job on the same input at two parallelism levels — local[8] vs
local[32] standing in for N vs 4N executors — reporting docs/sec at both
and efficiency = (throughput_32 / throughput_8) / 4.

Each config runs ``bench.py`` (pipeline-only mode) in a fresh subprocess
R times and takes the best run — the sandbox host has heavy background
load (observed 3-7x wall-clock noise), and best-of-R isolates the
engine's own scaling from host contention.

Usage: python scripts/scaling.py [chains] [repeats] [N] [4N]
(widths default 8 and 32; writes BENCH_SCALING_{N}v{4N}.json).
SPARK_GRAFT_LC=1 runs each width as local-cluster[N/2,2,mem] — separate
executor JVMs — and writes BENCH_SCALING_LC_{N}v{4N}.json instead.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


LC = os.environ.get("SPARK_GRAFT_LC") == "1"
# per-executor shape held constant across widths (2 cores each): scaling
# N executors -> 4N executors, the literal form of the two-cluster-size
# criterion. Worker grant in MB; executor heap = grant - 512 (session.py).
LC_EXEC_CORES = int(os.environ.get("SPARK_GRAFT_LC_CORES", "2"))
LC_WORKER_MB = int(os.environ.get("SPARK_GRAFT_LC_MB", "6144"))


def lc_master(cpus: int) -> str:
    n_exec = max(1, cpus // LC_EXEC_CORES)
    return f"local-cluster[{n_exec},{LC_EXEC_CORES},{LC_WORKER_MB}]"


# the campaign's narrow width, set by main() (run_once consults it for the
# SPARK_GRAFT_LO_RUNS1 single-run override)
_LO_WIDTH = [8]


def run_once(cpus: int, chains: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CHAINS=str(chains),
        SPARK_GRAFT_ONLY="pipeline",
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        # the PRODUCTION configuration: per-stage checkpoints (the resumable
        # path the north rule names). Measured round 3: the no-sink
        # in-memory columnar cache build is JVM-allocation-bound and
        # anti-scales in one shared heap (4M pages, 8 cores: 86-105 s
        # cached vs 64.7 s checkpointed), so scaling campaigns measure the
        # mode a cluster actually runs.
        SPARK_GRAFT_OUT=env_out(cpus),
    )
    if LC:
        # SPARK_GRAFT_LC=1: same job, same cores, but as N separate
        # 2-core executor JVMs (local-cluster) instead of one local[N]
        # heap — the judge's falsification test for the single-JVM
        # scaling-gap hypothesis.
        env["SPARK_GRAFT_MASTER"] = lc_master(cpus)
    # campaigns keep best-of-2 (recorded in runs_in_bench) even though
    # standalone bench.py defaults to best-of-3 — a campaign interleaves
    # its own rounds, so the extra in-bench repeat only stretches walls
    if "SPARK_GRAFT_RUNS" not in os.environ:
        env["SPARK_GRAFT_RUNS"] = "2"
    # giant-input campaigns: a single narrow-width run can approach the
    # subprocess timeout — drop its in-bench repeat, keep it for the wide
    # side (a slow narrow window then INFLATES eff; the same-window host
    # control stays next to the number so the reader can tell)
    if os.environ.get("SPARK_GRAFT_LO_RUNS1") == "1" and cpus == _LO_WIDTH[0]:
        env["SPARK_GRAFT_RUNS"] = "1"
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if os.environ.get("SPARK_GRAFT_PIN") == "1":
        # pin the whole process tree (driver, executors, python workers) to
        # exactly `cpus` physical cores: an unpinned "2-core" run burns
        # ~4-5 cores through python-worker/JVM-thread overlap (see
        # pip_scaling._run), silently deflating the width-ratio eff
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    # one retry on a no-JSON exit: a transient executor-registration miss
    # (get_spark now hard-fails on it, session.py) or a killed JVM should
    # cost one re-run, not a whole multi-hour campaign — and when both
    # attempts fail, the child's stderr is the diagnosis, so print it
    # instead of dying on a bare IndexError (lost 25 min of 24M-page wall
    # that way once)
    last = None
    for attempt in range(2):
        out = subprocess.run(
            cmd,
            env=env, capture_output=True, text=True,
            timeout=int(os.environ.get("SPARK_GRAFT_RUN_TIMEOUT", "3600")),
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if lines:
            return json.loads(lines[-1])
        last = out
        print(f"run_once(cpus={cpus}) attempt {attempt}: no JSON from bench.py "
              f"(rc={out.returncode}); stderr tail:", flush=True)
        print("\n".join(out.stderr.strip().splitlines()[-25:]), flush=True)
    raise RuntimeError(
        f"bench.py produced no JSON at cpus={cpus} after 2 attempts "
        f"(rc={last.returncode}); see stderr tail above")


def env_out(cpus: int) -> str:
    return os.environ.get("SPARK_GRAFT_OUT", f"/dev/shm/osmi_scaling_out_{cpus}")


def run_control(cpus: int) -> float:
    """Same-window pure-numpy host control (shared with pip_scaling):
    what a no-Spark multiprocessing pool of the refine kernel gets at this
    width, pts/s — the ratio across widths is what the HOST can scale."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pip_scaling import run_control as _rc

    return _rc(cpus)


def main() -> None:
    chains = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    _LO_WIDTH[0] = lo
    results: dict[int, dict] = {}
    ctl_best: dict[int, float] = {}
    # interleave widths so host-load drift hits both equally; run the
    # pure-numpy host control in the SAME window as each Spark run so the
    # recorded eff can be read against what the box physically offered
    for i in range(repeats):
        for cpus in (lo, hi):
            r = run_once(cpus, chains)
            c = run_control(cpus)
            print(f"cpus={cpus} run{i}: {r['value']} docs/sec "
                  f"({r['queries']['pipeline']}s, {r['pages']} pages) | "
                  f"host control {c:,.0f} pts/s", flush=True)
            if cpus not in results or r["value"] > results[cpus]["value"]:
                results[cpus] = r
            if cpus not in ctl_best or c > ctl_best[cpus]:
                ctl_best[cpus] = c

    thr_lo, thr_hi = results[lo]["value"], results[hi]["value"]
    eff = round((thr_hi / thr_lo) / (hi / lo), 3)
    ctl_eff = round((ctl_best[hi] / ctl_best[lo]) / (hi / lo), 3)
    pages = results[hi]["pages"]

    # self-describing repeat counts: an SPARK_GRAFT_LO_RUNS1 record drops
    # the narrow width's in-bench best-of repeat (which can inflate eff);
    # record it in the payload like pinned/masters so the reader never has
    # to infer it from a missing raw.pipeline_run2 (ADVICE.md r4)
    bench_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))
    lo_runs = 1 if os.environ.get("SPARK_GRAFT_LO_RUNS1") == "1" else bench_runs
    payload = {
        "chains": chains, "pages": pages, "repeats": repeats,
        "widths": [lo, hi],
        "runs_in_bench": {str(lo): lo_runs, str(hi): bench_runs},
        "mode": "checkpointed" + ("+local-cluster" if LC else ""),
        **({"masters": [lc_master(lo), lc_master(hi)]} if LC else {}),
        **({"pinned": True} if os.environ.get("SPARK_GRAFT_PIN") == "1" else {}),
        f"thr{lo}": thr_lo, f"thr{hi}": thr_hi, "eff": eff,
        f"wall{lo}": results[lo]["queries"]["pipeline"],
        f"wall{hi}": results[hi]["queries"]["pipeline"],
        f"control_thr{lo}": round(ctl_best[lo], 1),
        f"control_thr{hi}": round(ctl_best[hi], 1),
        "control_eff": ctl_eff,
        "eff_vs_host": round(eff / ctl_eff, 3) if ctl_eff else None,
        "raw": {str(k): v for k, v in results.items()},
    }
    tag = "LC_" if LC else ""
    if os.environ.get("SPARK_GRAFT_PIN") == "1":
        tag += "PIN_"
    tag += os.environ.get("SPARK_GRAFT_OUT_TAG", "")
    out = os.path.join(REPO, f"BENCH_SCALING_{tag}{lo}v{hi}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))
    print(f"\neff={eff} -> {out} written (fold into BENCH.md by hand)")


if __name__ == "__main__":
    main()
