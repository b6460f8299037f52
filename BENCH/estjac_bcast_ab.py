"""A/B: est-Jaccard signature re-attach — size-adaptive broadcast vs the
round-7 shuffled joins. Interleaved min-of-N in ONE JVM (the repo's bench
doctrine: same-code readings swing several-x on this shared host, so only
interleaved minima are citable).

Usage: python BENCH/estjac_bcast_ab.py [n_docs] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from bench import build_spark

    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    import __spark_entry__ as entry

    entry._ensure_pyfiles(spark)
    from pyspark.sql import functions as F

    from chinese_corpus_cleaning_spark.config import DedupConfig
    from chinese_corpus_cleaning_spark.operators import dedup
    from chinese_corpus_cleaning_spark.sources import gen

    gen_docs = gen.docs_df(spark, n_docs, partitions=32).cache()
    gen_docs.count()
    docs = gen_docs.select(F.col("url").alias("doc_id"), "text")
    cfg = DedupConfig()

    def run() -> float:
        t0 = time.perf_counter()
        dedup.dedup_representatives(docs, cfg, "doc_id", "text", 64).agg(
            F.count(F.lit(1)), F.sum(F.col("is_duplicate").cast("long"))
        ).collect()
        return round(time.perf_counter() - t0, 3)

    results: dict[str, list[float]] = {"bcast": [], "shuffle": []}
    # warmup (workers, codegen) outside the timed rounds
    run()
    for _ in range(rounds):
        dedup._SIG_BCAST_BUDGET_BYTES = 64 << 20
        results["bcast"].append(run())
        dedup._SIG_BCAST_BUDGET_BYTES = 0
        results["shuffle"].append(run())
    dedup._SIG_BCAST_BUDGET_BYTES = 64 << 20
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "runs": results,
                "min": {k: min(v) for k, v in results.items()},
                "loadavg": open("/proc/loadavg").read().strip(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
