"""Controlled capacity-cap reproduction for the bench drifters (r10
verdict #2, the cgroup variant).

The claim under test: range_l2 / knn_join / dedup_ngram read elevated in
throttled windows because they are the CPU-WIDE queries (parallel demand
~5-9 cores) while q1_pricing / sessionize / asof_join (~1.5-2.3 cores)
don't notice a ~7-core cap — and at DEEPER caps the calibration queries
get hit too (observed uncontrolled in r10 at canary 0.1×).

This tool reproduces the cap CONTROLLED, with the background window
cancelled by pairing: one local[32] session, each query executed in
interleaved rounds under three cgroup cpu.cfs_quota regimes — uncapped /
3.0 cores / 1.5 cores — applied to the driver JVM. Per (query, regime)
it reports median wall, median JVM CPU (utime+stime from /proc — note:
guest-visible scheduling time, which is why a *controlled* quota is
trustworthy where hypervisor steal is not), and effective cores.

Capacity-model predictions (falsifiable):
  1. Under quota Q, a query's effective cores clamp at ~min(Q, P_q): the
     drifters pin at the quota; the calibration queries keep their own
     P_q at Q=3 (P_q < 3) and pin only at Q=1.5.
  2. Wall elevation vs the same-window uncapped baseline ≈
     min(P_eff_uncapped, P_q) / min(Q, P_q): selective at Q=3 (drifters
     only), broad at Q=1.5 (everything with P_q > 1.5).
If instead the drifters fail to elevate under a binding quota, or the
calibration queries elevate equally at Q=3 (uniform slowdown), the
capacity model is falsified and the drifters must be marked weak and
plan-diffed.

Requires root + cgroup v1 cpu controller (this container has it).

Usage:
  RUNS=6 python tools/drifter_quota_ab.py
  QUOTAS="uncapped,0.75" python tools/drifter_quota_ab.py q1_pricing sessionize
  (positional args replace the default drifter+calibration entry list —
  any catalog entry name works, so future rounds can quota-test whatever
  query is under suspicion)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from drifter_capacity_test import (  # noqa: E402
    CALIBRATION,
    DRIFTERS,
    R08_WALL,
    _jvm_cpu_seconds,
    _jvm_pids,
)

CG_ROOT = "/sys/fs/cgroup/cpu"
CG = f"{CG_ROOT}/drifter_ab"
PERIOD_US = 100_000
REGIMES: "list[tuple[str, float | None]]" = [
    ("uncapped", None),
    ("quota3.0", 3.0),
    ("quota1.5", 1.5),
]
if os.environ.get("QUOTAS"):
    # e.g. QUOTAS="uncapped,0.75" — numbers become quota regimes
    REGIMES = [
        ("uncapped", None) if q == "uncapped" else (f"quota{q}", float(q))
        for q in os.environ["QUOTAS"].split(",")
    ]


def _write(path: str, val: str) -> None:
    with open(path, "w") as f:
        f.write(val)


def _move_jvm(to_cg: str) -> None:
    for pid in _jvm_pids():
        try:
            _write(f"{to_cg}/cgroup.procs", str(pid))
        except OSError as e:
            print(f"# cgroup move failed for {pid}: {e}", file=sys.stderr)


def _set_regime(cores: "float | None") -> None:
    if cores is None:
        _move_jvm(CG_ROOT)
        return
    _write(f"{CG}/cpu.cfs_period_us", str(PERIOD_US))
    _write(f"{CG}/cpu.cfs_quota_us", str(int(cores * PERIOD_US)))
    _move_jvm(CG)


def main() -> None:
    from vectorchord_spark.queries import catalog, serving_overrides
    from vectorchord_spark.session import get_spark
    from window_probe import probe

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("RUNS", "6"))
    argv_names = [a for a in sys.argv[1:] if not a.startswith("-")]
    os.makedirs(CG, exist_ok=True)

    spark = get_spark(app_name="vc-drifter-quota-ab")
    spark.sparkContext.setLogLevel("ERROR")
    p = probe()
    print(
        f"window: solo={p['solo_rotate_rows_per_s']:,} "
        f"parallel_scale_24t={p['parallel_scale_24t']} (clean ~18-22); "
        f"local[32], quota regimes: {[r for r, _ in REGIMES]}",
        flush=True,
    )
    cat = catalog()
    serving = serving_overrides()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    names = argv_names or (DRIFTERS + CALIBRATION)
    fns = {nm: serving.get(nm, cat[nm].fn) for nm in names}
    for nm in names:  # cold runs, uncapped
        fns[nm](spark, sf_dir).count()

    # interleaved rounds: regime is the innermost loop so each round's
    # three samples of one query land within seconds of each other and
    # the background window cancels in the ratios
    walls: dict = {(nm, r): [] for nm in names for r, _ in REGIMES}
    cpus: dict = {(nm, r): [] for nm in names for r, _ in REGIMES}
    try:
        for _ in range(n):
            for nm in names:
                for rname, cores in REGIMES:
                    _set_regime(cores)
                    c0 = _jvm_cpu_seconds()
                    t0 = time.perf_counter()
                    fns[nm](spark, sf_dir).count()
                    walls[(nm, rname)].append(time.perf_counter() - t0)
                    cpus[(nm, rname)].append(_jvm_cpu_seconds() - c0)
    finally:
        _set_regime(None)

    print(
        f"{'query':14s} {'regime':>9s} {'wall_med':>8s} {'cpu_med':>8s} "
        f"{'eff_cores':>9s} {'vs_uncap':>8s} {'r08':>6s}"
    )
    for nm in names:
        base = statistics.median(walls[(nm, "uncapped")])
        for rname, _ in REGIMES:
            w = statistics.median(walls[(nm, rname)])
            c = statistics.median(cpus[(nm, rname)])
            print(
                f"{nm:14s} {rname:>9s} {w:8.3f} {c:8.2f} {c / w:9.1f} "
                f"{w / base:8.2f} {R08_WALL.get(nm, float('nan')):6.3f}",
                flush=True,
            )
    p = probe()
    print(
        f"window(end): solo={p['solo_rotate_rows_per_s']:,} "
        f"parallel_scale_24t={p['parallel_scale_24t']}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
