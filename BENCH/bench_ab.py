"""One-shot min-of-3 for the sf0.1 dedup_minhash bench leg.

The dedup_minhash driver reading drifted 10.4 -> 16.1 -> 24.1 s across
rounds 2-4 while interleaved A/Bs (BENCH/dedup_ab.py) showed code parity —
pure host-noise envelope (same-code swings up to 3x logged in
dedup_ab_runs.jsonl). This script makes the citable number min-of-3:
identical setup to bench.py's dedup stage (generated sf0.1-sized corpus,
local[$SPARK_GRAFT_CPUS]), three back-to-back runs in one JVM, report all
three and the min. bench.py itself now also reports min-of-3 for this
stage, so the driver-visible BENCH_r{N} number uses the same rule.

Usage: python BENCH/bench_ab.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(os.environ.get("SPARK_GRAFT_SF", "0.1"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from chinese_corpus_cleaning_spark.operators import dedup
    from chinese_corpus_cleaning_spark.sources import gen

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ccc-bench-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    entrymod._ensure_pyfiles(spark)
    n_gen = max(int(200_000 * SF), 2_000)
    gen_docs = gen.docs_df(spark, n_gen, partitions=CPUS).cache()
    gen_docs.count()
    # warm the minhash python workers
    dedup.with_minhash(
        gen_docs.select(F.col("url").alias("doc_id"), "text").limit(64)
    ).agg(F.count(F.lit(1))).collect()

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        dedup.dedup_representatives(
            gen_docs.select(F.col("url").alias("doc_id"), "text")
        ).agg(
            F.count(F.lit(1)), F.sum(F.col("is_duplicate").cast("long"))
        ).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    print(
        json.dumps(
            {
                "stage": "dedup_minhash",
                "n_docs": n_gen,
                "cpus": CPUS,
                "runs": runs,
                "min": min(runs),
            }
        )
    )


if __name__ == "__main__":
    main()
