"""pack_sequences: two-phase bucket-prefix packing must equal the naive
global-window spec; shard arithmetic invariants; bucket-count invariance."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from chinese_corpus_cleaning_spark.operators.dedup import _h60_sql
from chinese_corpus_cleaning_spark.operators.sampling import pack_sequences
from chinese_corpus_cleaning_spark.sources import gen


def _docs(spark, n=400):
    return gen.docs_df(spark, n, partitions=8).select(
        F.split("url", "/").getItem(4).cast("long").alias("doc_id"), "text"
    )


def test_pack_matches_naive_window_and_invariants(spark):
    d = _docs(spark)
    budget = 97
    out = {
        r["doc_id"]: r for r in pack_sequences(d, budget=budget, n_buckets=16).collect()
    }
    slim = d.select(
        "doc_id",
        F.expr("size(split(coalesce(text, ''), ' '))").cast("long").alias("n"),
        F.expr(_h60_sql("cast(doc_id as string)")).alias("h"),
    )
    w = Window.orderBy("h", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = {
        r["doc_id"]: r
        for r in slim.withColumn("cum", F.sum("n").over(w)).collect()
    }
    assert set(out) == set(naive) and len(out) == 400
    for k, r in out.items():
        n, cum = naive[k]["n"], naive[k]["cum"]
        assert r["n_tokens"] == n and r["cum_tokens"] == cum, k
        assert r["shard_first"] == (cum - n) // budget, k
        assert r["shard_last"] == (cum - 1) // budget, k
        assert r["offset_in_shard"] == (cum - n) % budget, k
        assert 0 <= r["offset_in_shard"] < budget
        assert r["shard_first"] <= r["shard_last"]
    # the packed stream is gapless: total tokens == max cumulative
    assert sum(r["n_tokens"] for r in out.values()) == max(
        r["cum_tokens"] for r in out.values()
    )


def test_pack_bucket_count_invariance(spark):
    """n_buckets is a physical knob only — results must be identical."""
    d = _docs(spark, 200)
    a = sorted(map(tuple, pack_sequences(d, budget=64, n_buckets=4).collect()))
    b = sorted(map(tuple, pack_sequences(d, budget=64, n_buckets=64).collect()))
    assert a == b
