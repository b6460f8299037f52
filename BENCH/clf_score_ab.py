"""Classifier scoring-path A/B (measure, don't guess — CLAUDE.md doctrine):

  A. relational-decimal  — classifier_score as shipped (native explode ->
     (id,bucket) partial agg -> broadcast weight join -> decimal margin)
  B. relational-double   — same plan, quantize=None (raw double weights):
     isolates the decimal-arithmetic overhead
  C. pandas-udf          — the SHIPPED method="pandas" map-side path:
     broadcast dense numpy weight vector, one Arrow pass, per-batch
     gram->bucket memo, zero shuffle

Interleaved A/B/C rounds in ONE JVM (min per leg reported), loadavg logged.
Semantics note: A is the exact/gated form; B drops exactness; C matches B
up to float-add order. Usage: python BENCH/clf_score_ab.py [n_docs] [rounds]

Measured 2026-08-18 (100k docs, local[8]; min-of-3 in one JVM):
  decimal 6.229 / double 5.438 / pandas_udf 3.041 — the shipped
  method="pandas" map-side path is 2.05x the gated decimal form and
  crosses zero shuffles (a pre-memo prototype read 3.351; the per-batch
  gram->bucket memo is worth ~10%). Raw runs: clf_score_ab_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

N_BUCKETS = 1 << 16
NGRAM = 3


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from chinese_corpus_cleaning_spark.operators import classifier as C
    from chinese_corpus_cleaning_spark.sources import gen

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("clf-score-ab")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    entrymod._ensure_pyfiles(spark)
    lab = gen.labeled_docs_df(spark, n_docs, partitions=32).cache()
    lab.count()

    wdf = C.nb_logodds_weights(
        lab, n=NGRAM, n_buckets=N_BUCKETS
    ).localCheckpoint(eager=True)

    def leg_a():
        C.classifier_score(lab, wdf, n=NGRAM, n_buckets=N_BUCKETS).agg(
            F.count(F.lit(1)), F.sum(F.col("clf_keep").cast("long"))
        ).collect()

    def leg_b():
        C.classifier_score(
            lab, wdf, n=NGRAM, n_buckets=N_BUCKETS, quantize=None
        ).agg(
            F.count(F.lit(1)), F.sum(F.col("clf_keep").cast("long"))
        ).collect()

    def leg_c():
        C.classifier_score(
            lab, wdf, n=NGRAM, n_buckets=N_BUCKETS, method="pandas"
        ).agg(
            F.count(F.lit(1)), F.sum(F.col("clf_keep").cast("long"))
        ).collect()

    # warm both executor paths
    leg_b()
    leg_c()

    results: dict[str, list[float]] = {"decimal": [], "double": [], "pandas_udf": []}
    for _ in range(rounds):
        for name, fn in (
            ("decimal", leg_a),
            ("double", leg_b),
            ("pandas_udf", leg_c),
        ):
            t0 = time.perf_counter()
            fn()
            results[name].append(round(time.perf_counter() - t0, 3))

    out = {
        "n_docs": n_docs,
        "n_buckets": N_BUCKETS,
        "rounds": rounds,
        "loadavg": os.getloadavg(),
        "runs": results,
        "min": {k: min(v) for k, v in results.items()},
    }
    print(json.dumps(out))
    with open(os.path.join(HERE, "clf_score_ab_runs.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
