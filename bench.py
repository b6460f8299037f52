"""Benchmark harness: headline pipeline + operator throughputs.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "docs_per_sec": ...}

Stages:
  quality_scrub    end-to-end keep/drop + scrub with the FULL 43k-word
                   lexicon over the documents table (the headline workload)
  extract_langid   html->text + repeat removal + langid over a generated
                   CC-style corpus (sized by sf) — the reference's ingest path
  rule_native      the nine rule checks as pure native exprs (JVM-only path)
  dedup_minhash    MinHash signatures + banded LSH candidate pairs
  ngram_ppl        n-gram LM train (explode+agg) + relational scoring
  cosine_topk      brute-force cosine top-5 against a broadcast probe set
  composite_ann    PRODUCTION 4-component composite (rule+feature UDF +
                   n-gram ppl + RP-LSH-bucketed cluster score) — the
                   CartesianProduct-free plan that runs at 100 TB
  quality_classifier  the supervised quality axis (operators/classifier.py):
                   NB log-odds weights trained relationally on the labeled
                   generated corpus (explode -> agg over hashed char
                   3-grams), then the broadcast exact-decimal scorer over
                   the same corpus — train + score, both distributed
  paragraph_dedup  corpus-wide exact paragraph dedup over the generated
                   corpus (slim-hash winner agg + map-side rebuild)
  semdedup         SemDeDup production path: kmeans_fit (k=16, 2 Lloyd
                   iterations) + within-cell prior-cosine pruning over the
                   embeddings table
  curation_total   the composed curation mega-pipeline (plans/curation.py):
                   quality/scrub/PII -> near-dup dedup -> corpus boilerplate
                   removal -> deterministic stratified sample as ONE plan
                   over the generated corpus — proves the stage COMPOSITION
                   (checkpoint placement, observe metrics, bounded text
                   movement) at bench scale, not just each stage alone
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ccc-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def run_bench(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from chinese_corpus_cleaning_spark.operators import dedup, perplexity, similarity
    from chinese_corpus_cleaning_spark.operators.quality import with_quality
    from chinese_corpus_cleaning_spark.plans import catalog
    from chinese_corpus_cleaning_spark.sources import gen
    from chinese_corpus_cleaning_spark.sources.wordlists import broadcast_trie

    entrymod._ensure_pyfiles(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}

    # MIN OF N_RUNS PER STAGE (round-7 harness change, extending the
    # dedup_minhash min-of-3 doctrine to every stage): same-code driver
    # readings on this shared host swung up to 7x across rounds (evidence
    # in BENCH/BASELINE.md), and rounds 2-6 each burned verdict space
    # adjudicating window noise. The min over >=3 runs in ONE JVM is the
    # noise-robust per-stage number; the full per-run lists are reported
    # alongside so the distribution stays visible.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def timed(name, fn):
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
        all_runs[name] = runs

    trie_bc = broadcast_trie(spark)

    sf_num = sf
    n_gen = max(int(200_000 * sf_num), 2_000)
    # generated CC-style corpus, cached once: input to extract_langid (html)
    # and dedup_minhash (text); keeps stage timings free of generation cost
    gen_docs = gen.docs_df(spark, n_gen, partitions=CPUS).cache()
    gen_docs.count()

    # warm python workers so the first timed UDF stage doesn't pay startup
    with_quality(docs.select("doc_id", "text").limit(32), trie_bc).agg(
        F.count(F.lit(1))
    ).collect()

    timed(
        "quality_scrub",
        lambda: with_quality(docs.select(F.col("doc_id"), "text"), trie_bc)
        .select(F.count(F.lit(1)), F.sum(F.col("keep").cast("long")))
        .collect(),
    )

    timed(
        "extract_langid",
        lambda: __import__(
            "chinese_corpus_cleaning_spark.operators.extract", fromlist=["with_extraction"]
        )
        .with_extraction(gen_docs)
        .select(F.count(F.lit(1)), F.sum(F.col("is_zh").cast("long")))
        .collect(),
    )

    timed(
        "rule_native",
        lambda: catalog.q_rule_char_ratios(spark, sf_dir)
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    # near-dup join on the generated corpus: realistic near-dup families +
    # one hot host (the word-salad documents table is degenerate for LSH —
    # every doc collides with every other). This stage pioneered the
    # min-of-3 treatment in round 2 (same-code swings 10.4 -> 24.1 s,
    # BENCH/dedup_ab.py); `timed` now applies it everywhere.
    timed(
        "dedup_minhash",
        lambda: dedup.dedup_representatives(
            gen_docs.select(F.col("url").alias("doc_id"), "text")
        )
        .agg(F.count(F.lit(1)), F.sum(F.col("is_duplicate").cast("long")))
        .collect(),
    )

    def _ppl():
        model = perplexity.ngram_counts(docs, n=3)
        perplexity.perplexity_relational(docs, model, n=3).agg(
            F.count(F.lit(1))
        ).collect()

    timed("ngram_ppl", _ppl)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.limit(200)
    timed(
        "cosine_topk",
        lambda: similarity.cosine_topk(emb, k=5, probes=probes)
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    # the PRODUCTION 4-component composite (rule+feature UDF, n-gram ppl,
    # ANN cluster score via RP-LSH buckets) — CartesianProduct-free plan
    timed(
        "composite_ann",
        lambda: catalog.q_quality_keep_full_ann(spark, sf_dir)
        .agg(F.count(F.lit(1)), F.sum(F.col("keep_full").cast("long")))
        .collect(),
    )

    def _clf():
        from chinese_corpus_cleaning_spark.operators import classifier
        from chinese_corpus_cleaning_spark.sources.gen import label_docs

        lab = label_docs(gen_docs)
        w = classifier.nb_logodds_weights(lab, n=3, n_buckets=1 << 14)
        classifier.classifier_score(lab, w, n=3, n_buckets=1 << 14).agg(
            F.count(F.lit(1)), F.sum(F.col("clf_keep").cast("long"))
        ).collect()

    timed("quality_classifier", _clf)

    def _curation():
        from chinese_corpus_cleaning_spark.plans.curation import curation_run

        curated, _obs = curation_run(
            gen_docs,
            trie_bc,
            strata=("doc_class",),
            k_per_stratum=max(n_gen // 100, 50),
            id_col="url",
        )
        curated.agg(F.count(F.lit(1))).collect()

    timed("curation_total", _curation)

    def _para():
        from chinese_corpus_cleaning_spark.operators.textanalysis import (
            paragraph_dedup,
        )

        paragraph_dedup(
            gen_docs.select(F.col("url").alias("doc_id"), "text")
        ).agg(F.count(F.lit(1)), F.sum("n_dropped")).collect()

    timed("paragraph_dedup", _para)

    def _semdedup():
        cents = similarity.kmeans_fit(emb, k=16, iters=2)
        similarity.semdedup(emb, tau=0.3, centroids=cents).agg(
            F.count(F.lit(1)), F.sum(F.col("semdedup_keep").cast("long"))
        ).collect()

    timed("semdedup", _semdedup)

    timings["_n_docs"] = n_docs
    timings["_runs"] = all_runs
    return timings


def main() -> None:
    spark = build_spark(CPUS)
    try:
        timings = run_bench(spark, SF_DIR)
    finally:
        spark.stop()
    n_docs = timings.pop("_n_docs")
    all_runs = timings.pop("_runs", {})
    # headline total = the six round-1 stages, stable across rounds so
    # BENCH_r{N} values stay comparable; stages added later (composite_ann)
    # are reported in "queries" but not folded into "value".
    # NOTE (round 7): every per-stage value is now a MIN over >=3 in-JVM
    # runs ("runs" carries the full lists). Rounds 1-6 were single-shot
    # except dedup_minhash — cross-round comparisons against r06 and
    # earlier compare their single-shot values to these minima
    # (BENCH/BASELINE.md records the boundary).
    headline = (
        "quality_scrub", "extract_langid", "rule_native",
        "dedup_minhash", "ngram_ppl", "cosine_topk",
    )
    total = round(sum(timings[k] for k in headline if k in timings), 3)
    out = {
        "metric": "quality_filter_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "n_docs": n_docs,
        "docs_per_sec_quality_scrub": round(n_docs / timings["quality_scrub"], 1),
        "runs": all_runs,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
