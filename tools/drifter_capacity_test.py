"""Capacity-matched falsification test for the r09/r10 bench drifters.

The r10 mechanism claim: range_l2 / knn_join / dedup_ngram are elevated
in throttled windows because they are the CPU-WIDE queries — their
parallel demand exceeds the ~7 cores the throttled hypervisor delivers,
while calibration queries (q1_pricing / sessionize / asof_join, ~2-core
demand) never notice. That claim was inferred from /proc CPU in an
UNCONTROLLED throttled window; this tool tests it from the CONTROLLED
side, per the r10 verdict's #2: run the same isolated 8-run protocol in
a deliberately capped session (``SPARK_GRAFT_CPUS=6`` ≈ the throttled
host's ~7 deliverable cores) and compare each wall against the capacity
model's prediction

    wall_pred(K) = C_q / min(K, P_q),   P_q = C_q / wall_r08

where C_q is the query's fixed CPU demand (measured per run via the
JVM's /proc utime+stime — code is hash-clean since r07, so C_q cannot
have moved) and wall_r08 is the clean-window r08 reference wall at 32
threads.

One refinement over the verdict's sketch: on THIS container the
background hypervisor throttle never lifts (50 probes over 4h in r10,
max 0.5×), so "local[6]" does not mean 6 deliverable cores — K must be
the canary-measured cores the window actually delivers to 6 threads,
``D6 = parallel_scale_6t`` (same rotate canary as window_probe, run at
threads=6 bracketing the query loop). The testable capacity-model
prediction becomes

    wall_pred = C_q / min(D6, P_q)

i.e. a CPU-wide query extracts exactly the deliverable capacity and no
more; a ~2-core calibration query is bound by its own P_q whenever
D6 > P_q. Confirmed = wall/pred ≈ 1 for the drifters under the same
model that fits the calibration queries; falsified = drifters read far
above what deliverable capacity explains (→ mark weak, root-cause the
plans).

Usage:
  SPARK_GRAFT_CPUS=6 RUNS=8 python tools/drifter_capacity_test.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: r08 clean-window reference walls at local[32], sf0.1 (BENCH_r08.json)
R08_WALL = {
    "range_l2": 0.236,
    "knn_join": 0.488,
    "dedup_ngram": 0.564,
    "q1_pricing": 0.292,
    "sessionize": 0.488,
    "asof_join": 0.284,
}
DRIFTERS = ["range_l2", "knn_join", "dedup_ngram"]
CALIBRATION = ["q1_pricing", "sessionize", "asof_join"]


def _jvm_pids() -> list[int]:
    """All java processes descended from this python (the local-mode
    driver JVM; possibly a window_probe child if one is running)."""
    pids = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/comm") as f:
                if f.read().strip() != "java":
                    continue
        except OSError:
            continue
        pids.append(int(p))
    return pids


def _jvm_cpu_seconds() -> float:
    """Sum of utime+stime over all java processes, in seconds."""
    hz = os.sysconf("SC_CLK_TCK")
    total = 0
    for pid in _jvm_pids():
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # fields after comm: state(0) ... utime(11) stime(12)
            total += int(parts[11]) + int(parts[12])
        except (OSError, IndexError, ValueError):
            continue
    return total / hz


def main() -> None:
    from vectorchord_spark.queries import catalog, serving_overrides
    from vectorchord_spark.session import get_spark
    from window_probe import probe

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("RUNS", "8"))
    k = int(os.environ.get("SPARK_GRAFT_CPUS", "6"))

    spark = get_spark(app_name="vc-drifter-capacity")
    spark.sparkContext.setLogLevel("ERROR")
    p24 = probe()
    p6a = probe(threads=6)
    d6_start = p6a["parallel_scale_24t"]  # key name is generic: agg/solo
    print(
        f"window: solo={p24['solo_rotate_rows_per_s']:,} "
        f"parallel_scale_24t={p24['parallel_scale_24t']} (clean ~18-22); "
        f"deliverable cores at 6 threads D6={d6_start} (clean ~5-6); "
        f"session threads K={k}",
        flush=True,
    )
    cat = catalog()
    serving = serving_overrides()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    print(
        f"{'query':14s} {'wall_med':>8s} {'cpu_med':>8s} {'eff_cores':>9s} "
        f"{'P_q':>5s} {'pred':>7s} {'r08':>6s} {'wall/pred':>9s}"
    )
    rows = []
    for name in DRIFTERS + CALIBRATION:
        fn = serving.get(name, cat[name].fn)
        fn(spark, sf_dir).count()  # cold: codegen/worker spawn
        walls, cpus = [], []
        for _ in range(n):
            c0 = _jvm_cpu_seconds()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
            cpus.append(_jvm_cpu_seconds() - c0)
        rows.append((name, statistics.median(walls), statistics.median(cpus)))
    p6b = probe(threads=6)
    d6 = (d6_start + p6b["parallel_scale_24t"]) / 2
    for name, wall, cpu in rows:
        pq = cpu / R08_WALL[name]
        pred = cpu / min(d6, pq) if pq > 0 else float("nan")
        print(
            f"{name:14s} {wall:8.3f} {cpu:8.2f} {cpu / wall:9.1f} "
            f"{pq:5.1f} {pred:7.3f} {R08_WALL[name]:6.3f} {wall / pred:9.2f}",
            flush=True,
        )
    p24b = probe()
    print(
        f"window(end): solo={p24b['solo_rotate_rows_per_s']:,} "
        f"parallel_scale_24t={p24b['parallel_scale_24t']} "
        f"D6(end)={p6b['parallel_scale_24t']} (D6 mean used: {d6:.2f})",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
