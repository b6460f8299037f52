"""Absolute recall of the PRODUCTION dedup default (bucket cap 64 + 4-hub
star rescue) against the EXACT banded-LSH form the correctness gate pins
(max_band_bucket=None) — the round-5 verdict's missing number: the shipped
−2.5 % was measured against cap 256, itself an approximation.

Three recall levels, all deterministic (bit-identical across runs):
  pair_recall      |similar pairs (prod) ∩ (exact)| / |exact|   — the raw
                   LSH+est-Jaccard pair surface (prod pairs are a subset of
                   exact pairs by construction: star rescue only ever pairs
                   within a bucket the exact form fully enumerates)
  dup_doc_recall   |duplicate docs (prod) ∩ (exact)| / |exact|  — after
                   connected components + min-id representative election:
                   transitivity rescues pairs the cap dropped
  family_recall    fraction of generator ground-truth near-dup FAMILY pairs
                   (same doc_id // family_size, class near_dup — built to
                   shingle-Jaccard ~0.9, sources/gen.py) each form detects

Usage: python BENCH/dedup_recall_abs.py [n_docs ...]   (default 100000 400000)
Appends one JSON line per n to BENCH/dedup_recall_abs_runs.jsonl.
Run with NOTHING else on the machine (CLAUDE.md contamination rule) —
though recall counts, unlike walls, are load-independent.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "BENCH", "dedup_recall_abs_runs.jsonl")


def main(sizes: list[int]) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from chinese_corpus_cleaning_spark.operators.dedup import (
        dedup_representatives,
        minhash_similarity_pairs,
    )
    from chinese_corpus_cleaning_spark.sources import gen

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("dedup-recall-abs")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    entrymod._ensure_pyfiles(spark)

    for n in sizes:
        docs = (
            gen.docs_df(spark, n, partitions=32)
            .select(F.col("url").alias("doc_id"), "text", "doc_class")
            .localCheckpoint(eager=True)
        )

        def pairs(cap):
            return (
                minhash_similarity_pairs(
                    docs, id_col="doc_id", max_band_bucket=cap
                )
                .select("id_a", "id_b")
                .localCheckpoint(eager=True)
            )

        def dups(cap):
            return (
                dedup_representatives(
                    docs, id_col="doc_id", max_band_bucket=cap
                )
                .where("is_duplicate")
                .select("id")
                .localCheckpoint(eager=True)
            )

        t0 = time.time()
        p_exact, p_prod = pairs(None), pairs(64)
        n_pe, n_pp = p_exact.count(), p_prod.count()
        n_pair_common = p_exact.join(p_prod, ["id_a", "id_b"], "left_semi").count()

        d_exact, d_prod = dups(None), dups(64)
        n_de, n_dp = d_exact.count(), d_prod.count()
        n_doc_common = d_exact.join(d_prod, "id", "left_semi").count()

        # generator ground truth: near_dup family pairs (url carries the
        # class; doc_id//family_size is the family key)
        fam = docs.where(F.col("doc_class") == "near_dup").select(
            "doc_id",
            (
                F.regexp_extract("doc_id", r"/(\d+)$", 1).cast("long")
                / F.lit(gen._NEAR_DUP_FAMILY_SIZE)
            ).cast("long").alias("family"),
        )
        truth = (
            fam.alias("l")
            .join(fam.alias("r"), "family")
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
            )
            .localCheckpoint(eager=True)
        )
        # pair tables are ordered id_a < id_b lexicographically on urls;
        # normalize truth the same way before the semi-joins
        truth = truth.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        n_truth = truth.count()
        t_exact = truth.join(p_exact, ["id_a", "id_b"], "left_semi").count()
        t_prod = truth.join(p_prod, ["id_a", "id_b"], "left_semi").count()

        rec = {
            "n_docs": n,
            "pairs_exact": n_pe,
            "pairs_prod": n_pp,
            "pair_common": n_pair_common,
            "pair_recall": round(n_pair_common / max(n_pe, 1), 5),
            "dup_docs_exact": n_de,
            "dup_docs_prod": n_dp,
            "dup_doc_common": n_doc_common,
            "dup_doc_recall": round(n_doc_common / max(n_de, 1), 5),
            "family_pairs": n_truth,
            "family_hit_exact": t_exact,
            "family_hit_prod": t_prod,
            "family_recall_exact": round(t_exact / max(n_truth, 1), 5),
            "family_recall_prod": round(t_prod / max(n_truth, 1), 5),
            "wall": round(time.time() - t0, 1),
        }
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")

    spark.stop()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [100_000, 400_000])
