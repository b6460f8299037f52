"""Micro-benchmark: numpy-batched SimHash UDF (functions/hashing.
simhash60_batch) vs the per-doc Python loop (the round-4 verdict's
'simhash_udf is a per-doc loop that never got the ppl-style A/B' nit).
Same methodology as ppl_udf_bench.py: both forms in one JVM, warmed,
interleaved 2 timed rounds each, value agreement checked via an aggregate
over the full output.

Runs on BOTH corpora shapes: the sf0.1 documents table (ASCII word salad —
many short tokens/doc, the shape simhash actually sees) and the generated
CC-style corpus (Chinese text — few huge whitespace tokens/doc).

Usage: python BENCH/simhash_udf_bench.py [n_docs=50000] [cpus=8]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_corpus(spark, docs, new_udf, old_udf):
    from pyspark.sql import functions as F

    def run(udf):
        t0 = time.perf_counter()
        row = (
            docs.select(udf(F.col("text")).alias("s"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.expr("s % 1000003")).alias("chk"))
            .collect()[0]
        )
        return round(time.perf_counter() - t0, 3), (row["n"], row["chk"])

    run(new_udf), run(old_udf)  # warm both code paths
    res = {"new": [], "old": []}
    checks = set()
    for _ in range(2):
        t, c = run(new_udf)
        res["new"].append(t)
        checks.add(c)
        t, c = run(old_udf)
        res["old"].append(t)
        checks.add(c)
    return {
        "new_sec": res["new"],
        "old_sec": res["old"],
        "speedup_min": round(min(res["old"]) / min(res["new"]), 2),
        "values_agree": len(checks) == 1,
    }


def main(n_docs: int, cpus: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from chinese_corpus_cleaning_spark.operators import dedup
    from chinese_corpus_cleaning_spark.sources import gen

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    entrymod._ensure_pyfiles(spark)
    new_udf, old_udf = dedup.simhash_udf(), dedup.simhash_udf_loop()

    # replicate the 5k-row word-salad table up to ~n_docs rows so the stage
    # isn't dominated by fixed scan/schedule cost; suffix keeps texts distinct
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("text")
    reps = max(n_docs // 5000, 1)
    docs_tbl = (
        base.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .select(F.concat_ws(" ", "text", F.col("rep").cast("string")).alias("text"))
        .repartition(cpus * 2)
        .cache()
    )
    n_tbl = docs_tbl.count()
    gen_docs = gen.docs_df(spark, n_docs, partitions=cpus * 2).select("text").cache()
    gen_docs.count()

    out = {
        "cpus": cpus,
        "documents_sf01": {"n_docs": n_tbl, **bench_corpus(spark, docs_tbl, new_udf, old_udf)},
        "gen_corpus": {"n_docs": n_docs, **bench_corpus(spark, gen_docs, new_udf, old_udf)},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 50_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
