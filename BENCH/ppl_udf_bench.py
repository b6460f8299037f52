"""Micro-benchmark: numpy-batched broadcast-UDF perplexity scorer vs the
per-row reference loop (the round-3 verdict's 'Series.map with a per-row
Python closure' nit). Times BOTH implementations on the identical broadcast
model + corpus inside one JVM, interleaved, and checks value agreement.

Usage: python BENCH/ppl_udf_bench.py [n_docs=20000] [cpus=8]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(n_docs: int, cpus: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    import __spark_entry__ as entrymod
    from chinese_corpus_cleaning_spark.functions.ngram_lm import BOS, EOS, LOG_FLOOR
    from chinese_corpus_cleaning_spark.operators import perplexity
    from chinese_corpus_cleaning_spark.sources import gen

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    entrymod._ensure_pyfiles(spark)
    docs = gen.docs_df(spark, n_docs, partitions=cpus * 2).select(
        F.col("url").alias("doc_id"), "text"
    ).cache()
    docs.count()

    model_bc = perplexity.train_broadcast_model(spark, docs, n=3)
    new_udf = perplexity.perplexity_udf(model_bc)

    _SEP = "\x1f"

    def old_udf_factory(bc):
        # the pre-round-4 per-row loop, verbatim semantics
        @F.pandas_udf(DoubleType())
        def ppl(texts: pd.Series) -> pd.Series:
            m = bc.value
            n, alpha, v = m["n"], m["alpha"], m["v"]
            pairs, ctx_tot = m["pairs"], m["ctx"]

            def one(t):
                if t is None:
                    return None
                toks = [BOS] * (n - 1) + t.split(" ") + [EOS]
                total, cnt = 0.0, 0
                for i in range(n - 1, len(toks)):
                    ctx = _SEP.join(toks[i - (n - 1) : i])
                    num = pairs.get(ctx + _SEP + toks[i], 0) + alpha
                    den = ctx_tot.get(ctx, 0) + alpha * v
                    p = num / den if den > 0 else 0.0
                    total += math.log2(p) if p > 0 else LOG_FLOOR
                    cnt += 1
                return 2.0 ** (-total / cnt) if cnt else float("inf")

            return texts.map(one)

        return ppl

    old_udf = old_udf_factory(model_bc)

    def run(udf):
        t0 = time.perf_counter()
        row = docs.select(udf(F.col("text")).alias("p")).agg(
            F.count(F.lit(1)), F.round(F.avg("p"), 6).alias("avg")
        ).collect()[0]
        return round(time.perf_counter() - t0, 3), float(row["avg"])

    # warm both code paths once, then interleave 2 timed rounds each
    run(new_udf), run(old_udf)
    results = {"new": [], "old": []}
    avgs = set()
    for _ in range(2):
        t, a = run(new_udf)
        results["new"].append(t)
        avgs.add(a)
        t, a = run(old_udf)
        results["old"].append(t)
        avgs.add(a)
    out = {
        "n_docs": n_docs,
        "cpus": cpus,
        "new_sec": results["new"],
        "old_sec": results["old"],
        "speedup_min": round(min(results["old"]) / min(results["new"]), 2),
        "avg_ppl_agree": len(avgs) == 1,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 20_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
