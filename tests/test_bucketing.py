"""Bucketed co-located join: pre-bucketing both sides of a recurring join key
removes the shuffle entirely (SURVEY.md §4 / scale design: reuse a
partitioning across stages). The plan must contain no Exchange."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from chinese_corpus_cleaning_spark.sources import gen


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf (set at session build); the default
    # spark-warehouse under the test cwd is fine — drop tables on teardown
    docs = gen.docs_df(spark, 400, partitions=4).select("url", "text")
    labels = docs.select("url", (F.length("text") >= 100).alias("keep"))
    docs.write.bucketBy(8, "url").sortBy("url").mode("overwrite").saveAsTable(
        "docs_bucketed"
    )
    labels.write.bucketBy(8, "url").sortBy("url").mode("overwrite").saveAsTable(
        "labels_bucketed"
    )
    return spark


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force a sort-merge join so the bucketing (not a broadcast) is what
    # removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("docs_bucketed").join(
            spark.table("labels_bucketed"), "url"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 400
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(bucketed, spark):
    """Control: the same join over plain frames shows Exchange nodes (unless
    the optimizer broadcasts — force SMJ by disabling autoBroadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = gen.docs_df(spark, 400, partitions=4).select("url", "text")
        labels = docs.select("url", (F.length("text") >= 100).alias("keep"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            docs.join(labels, "url").explain("formatted")
        assert "Exchange" in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module", autouse=True)
def _cleanup(request):
    yield
    import shutil

    shutil.rmtree("spark-warehouse", ignore_errors=True)
