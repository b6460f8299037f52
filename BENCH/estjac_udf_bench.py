"""Micro-benchmark: est-Jaccard slot-agreement — interpreted zip_with lambda
(current relational form, with the exact 32-slot prefix prune) vs a
numpy-batched Arrow pandas UDF computing the full agreement fraction in one
vectorized compare. Same doctrine as ppl_udf_bench.py: both forms timed on
the identical checkpointed (pairs x signatures) join inside one JVM,
interleaved, with output agreement asserted (count + sum of est_jaccard).

Context: at 1.6M docs the est-Jaccard stage is 368s@2 / 92.5s@8 over 16.6M
candidates (BENCH/BASELINE.md round-5 phase table) — it scales perfectly
(eff 1.00) but is the largest @2 phase; CLAUDE.md's landmine says
higher-order lambdas are interpreted and Arrow+numpy often wins. Measure.

Usage: python BENCH/estjac_udf_bench.py [n_docs=400000] [cpus=8]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(n_docs: int, cpus: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from chinese_corpus_cleaning_spark.config import DedupConfig
    from chinese_corpus_cleaning_spark.operators import dedup
    from chinese_corpus_cleaning_spark.sources import gen

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    entrymod._ensure_pyfiles(spark)
    cfg = DedupConfig()
    docs = (
        gen.docs_df(spark, n_docs, partitions=cpus * 4)
        .select(F.col("url").alias("doc_id"), "text")
    )
    signed = dedup.with_minhash(docs, cfg).localCheckpoint(eager=True)
    pairs = dedup.lsh_candidate_pairs(signed, "doc_id", 64).localCheckpoint(
        eager=True
    )
    sig_a = signed.select(
        F.col("doc_id").alias("id_a"), F.col("minhash").alias("minhash_a")
    )
    sig_b = signed.select(
        F.col("doc_id").alias("id_b"), F.col("minhash").alias("minhash_b")
    )
    joined = (
        pairs.join(sig_a, "id_a").join(sig_b, "id_b").localCheckpoint(eager=True)
    )
    n_cand = joined.count()

    nh = cfg.num_hashes
    thr = cfg.similarity_threshold
    k_min = next(k for k in range(nh + 1) if k / nh >= thr)
    prefix = min(32, nh)
    need = k_min - (nh - prefix)
    full_agree = (
        "size(filter(zip_with(minhash_a, minhash_b, (x, y) -> x = y), v -> v))"
    )
    prefix_agree = (
        f"size(filter(zip_with(slice(minhash_a, 1, {prefix}),"
        f" slice(minhash_b, 1, {prefix}), (x, y) -> x = y), v -> v))"
    )

    def relational():
        cond = F.expr(f"{full_agree} / size(minhash_a) >= {thr}")
        if need > 0:
            cond = F.expr(f"{prefix_agree} >= {need}") & cond
        return (
            joined.where(cond)
            .withColumn("est_jaccard", F.expr(f"{full_agree} / size(minhash_a)"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("est_jaccard"), 6).alias("s"),
            )
            .collect()[0]
        )

    @F.pandas_udf("double")
    def agree_frac(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(a.values)
        B = np.vstack(b.values)
        return pd.Series((A == B).mean(axis=1))

    def arrow_numpy():
        return (
            joined.withColumn("est_jaccard", agree_frac("minhash_a", "minhash_b"))
            .where(F.col("est_jaccard") >= thr)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("est_jaccard"), 6).alias("s"),
            )
            .collect()[0]
        )

    results: dict[str, list[float]] = {"relational": [], "arrow_numpy": []}
    vals = {}
    for _ in range(3):
        for name, fn in (("relational", relational), ("arrow_numpy", arrow_numpy)):
            t0 = time.perf_counter()
            row = fn()
            results[name].append(round(time.perf_counter() - t0, 2))
            vals[name] = (row["n"], float(row["s"]))
    assert vals["relational"] == vals["arrow_numpy"], vals
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "cpus": cpus,
                "n_cand": n_cand,
                "n_pass": vals["relational"][0],
                "runs": results,
                "min": {k: min(v) for k, v in results.items()},
                "agree": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 400_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
