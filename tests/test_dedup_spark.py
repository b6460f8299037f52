"""End-to-end near-dup dedup: exact groups collapse, near-dup families are
detected via MinHash-LSH + connected components, representatives elected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chinese_corpus_cleaning_spark.operators import dedup
from chinese_corpus_cleaning_spark.sources import gen


@pytest.fixture(scope="module")
def labeled_docs(spark):
    df = gen.docs_df(spark, 600, partitions=4).select(
        F.col("url").alias("doc_id"), "text", "doc_class"
    )
    reps = dedup.dedup_representatives(df.select("doc_id", "text"))
    return df.join(reps.withColumnRenamed("id", "doc_id"), "doc_id").cache()


def test_exact_duplicates_collapse(labeled_docs):
    # short_text docs have only 10 distinct variants -> exact dup groups
    shorts = labeled_docs.where(F.col("doc_class") == "short_text")
    n = shorts.count()
    n_comp = shorts.select("component").distinct().count()
    assert n_comp <= 10 < n


def test_near_dup_families_detected(labeled_docs):
    fams = (
        labeled_docs.where(F.col("doc_class") == "near_dup")
        .withColumn(
            "family",
            (F.split(F.col("doc_id"), "/").getItem(4).cast("long") / gen._NEAR_DUP_FAMILY_SIZE).cast("long"),
        )
        .groupBy("family")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("component").alias("n_comp"),
        )
        .where(F.col("n") >= 3)
        .collect()
    )
    assert fams
    # most families with >=3 members collapse to fewer components than members
    collapsed = sum(1 for r in fams if r["n_comp"] < r["n"])
    assert collapsed >= 0.6 * len(fams), [(r["n"], r["n_comp"]) for r in fams]


def test_normal_docs_not_duplicates(labeled_docs):
    normals = labeled_docs.where(F.col("doc_class") == "normal_zh")
    dup_ratio = normals.agg(
        F.avg(F.col("is_duplicate").cast("double"))
    ).collect()[0][0]
    assert dup_ratio < 0.05


def test_connected_components_chain(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11)], ["id_a", "id_b"]
    )
    comp = {r["id"]: r["comp"] for r in dedup.connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == comp[12] == 10


def test_salt_hot_keys(spark):
    df = spark.createDataFrame(
        [("hot",)] * 100 + [("cold%d" % i,) for i in range(20)], ["host"]
    )
    salted = dedup.salt_hot_keys(df, "host", threshold=50, salt_buckets=8)
    hot_keys = (
        salted.where(F.col("host") == "hot").select("salted_key").distinct().count()
    )
    cold_keys = (
        salted.where(F.col("host") != "hot").select("salted_key").distinct().count()
    )
    assert 2 <= hot_keys <= 8
    assert cold_keys == 20


def test_host_rollup_salted_matches_direct(spark):
    from chinese_corpus_cleaning_spark.operators.textanalysis import host_rollup

    docs = gen.docs_df(spark, 800, partitions=4).select("url", "text")
    salted = {r["host"]: (r["n_docs"], r["total_chars"]) for r in host_rollup(docs).collect()}
    direct = {
        r["host"]: (r["n"], r["s"])
        for r in docs.groupBy(F.parse_url("url", F.lit("HOST")).alias("host"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("s"))
        .collect()
    }
    assert salted == direct
    # the generator's hot host really is skewed (~30% of docs)
    hot = salted[gen.HOT_HOST][0]
    assert 0.2 * 800 < hot < 0.4 * 800
