"""In-context interleaved A/B for the stage-6 keeper-window rewrite:
full curate() at the bench's exact configuration, old module (pre-edit
snapshot) vs the installed new one, kept+audit equality asserted once,
then alternating timed runs. Usage:
  python tools/profile_curate_keepbest_ab.py <old_module_path> [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from vectorchord_spark.pipeline import curate as new_mod
    from vectorchord_spark.session import get_spark

    old_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(os.environ.get("ROUNDS", "5"))

    spec = importlib.util.spec_from_file_location("curate_old_ab", old_path)
    old_mod = importlib.util.module_from_spec(spec)
    sys.modules["curate_old_ab"] = old_mod  # dataclass needs the registry
    spec.loader.exec_module(old_mod)

    spark = get_spark(app_name="vc-curate-keepbest-ab")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def cfg(mod):
        return mod.CurateConfig(
            min_words=10, langs=("en", "de", "fr"),
            max_top_2gram_frac=0.2, max_dup_3gram_frac=0.5,
            min_quality=0.2, exact_dedup=True, near_dedup=True,
        )

    def run(mod):
        r = mod.curate(docs, cfg(mod))
        return r.kept.select(F.col("doc_id")).unionAll(
            r.audit.select(F.col("id").alias("doc_id"))
        ).count()

    def rows(mod):
        r = mod.curate(docs, cfg(mod))
        kept = sorted(tuple(x) for x in r.kept.collect())
        audit = sorted(tuple(x) for x in r.audit.collect())
        return kept, audit

    ko, ao = rows(old_mod)
    kn, an = rows(new_mod)
    assert ko == kn and ao == an, "old/new curate outputs differ"
    print(f"equality OK (kept={len(ko)}, audit={len(ao)})")

    walls = {"old": [], "new": []}
    for i in range(rounds):
        for name, mod in (("old", old_mod), ("new", new_mod)):
            spark.sparkContext.setJobDescription(f"curate {name} r{i}")
            t0 = time.perf_counter()
            run(mod)
            walls[name].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    for name, ws in walls.items():
        ws.sort()
        print(f"{name}: median {ws[len(ws)//2]:.3f}s  (min {ws[0]:.3f} max {ws[-1]:.3f})")


if __name__ == "__main__":
    main()
