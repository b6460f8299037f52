"""Per-phase dissection of the PRODUCTION dedup_representatives pipeline at
one parallelism level — the instrument that located round 3's non-scaling
time (driver-CC serial; see BENCH/BASELINE.md round-3 notes). Unlike
dedup_breakdown.py (2-level Amdahl over mirrored phases), this times the
exact code path the probes run, plus the CC sub-steps and candidate counts.

Usage: python BENCH/dedup_phase_diag.py [cpus] [n_docs] [cap]; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cpus: int, n_docs: int, cap: int = 256) -> None:
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
    docs = gen.docs_df(spark, n_docs, partitions=cpus * 4).select(
        F.col("url").alias("doc_id"), "text"
    ).cache()
    docs.count()
    dedup.with_minhash(docs.limit(64)).agg(F.count(F.lit(1))).collect()

    cfg = DedupConfig()
    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        t[name] = round(time.perf_counter() - t0, 2)
        return r

    keyed = docs.select(
        F.col("doc_id").alias("id"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("h"),
    )
    groups = timed(
        "exact_groups",
        lambda: keyed.groupBy("h")
        .agg(F.min("id").alias("rep"))
        .localCheckpoint(eager=True),
    )
    exact_edges = timed(
        "exact_edges",
        lambda: keyed.join(groups, "h")
        .where(F.col("id") != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col("id").alias("id_b"))
        .localCheckpoint(eager=True),
    )
    reps = timed(
        "reps_semijoin",
        lambda: docs.select(F.col("doc_id").alias("id"), "text")
        .join(groups.select(F.col("rep").alias("id")), "id", "left_semi")
        .localCheckpoint(eager=True),
    )
    signed = timed(
        "signature",
        lambda: dedup.with_minhash(reps, cfg, "id", "text").localCheckpoint(
            eager=True
        ),
    )
    pairs = timed(
        "lsh_band_join",
        lambda: dedup.lsh_candidate_pairs(signed, "id", cap).localCheckpoint(
            eager=True
        ),
    )
    n_cand = pairs.count()
    sig_a = signed.select(
        F.col("id").alias("id_a"), F.col("minhash").alias("minhash_a")
    )
    sig_b = signed.select(
        F.col("id").alias("id_b"), F.col("minhash").alias("minhash_b")
    )
    near = timed(
        "est_join_filter",
        lambda: pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn(
            "est_jaccard",
            F.expr(
                "size(filter(zip_with(minhash_a, minhash_b, (x, y) -> x = y),"
                " v -> v)) / size(minhash_a)"
            ),
        )
        .where(F.col("est_jaccard") >= cfg.similarity_threshold)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True),
    )
    edges = near.union(exact_edges).localCheckpoint(eager=True)
    comp = timed("cc", lambda: dedup.connected_components(edges))
    timed(
        "label",
        lambda: docs.select(F.col("doc_id").alias("id"))
        .join(comp, "id", "left")
        .withColumn("component", F.coalesce("comp", "id"))
        .agg(
            F.count(F.lit(1)),
            F.sum((F.col("id") != F.col("component")).cast("long")),
        )
        .collect(),
    )
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "cap": cap,
                "n_reps": reps.count(),
                "n_cand": n_cand,
                "n_near": near.count(),
                "n_exact": exact_edges.count(),
                "n_edges": edges.count(),
                "t": t,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8,
        int(sys.argv[2]) if len(sys.argv) > 2 else 400_000,
        int(sys.argv[3]) if len(sys.argv) > 3 else 256,
    )
