"""Round-8 optimization equivalence pins: the whole-stage-codegen unrolled
fast paths must be BIT-IDENTICAL to the interpreted higher-order forms they
replaced (the gate hashes exact values, so 'close' is not enough).

Covers:
  * similarity._dot unroll vs the aggregate/zip_with fold — 64-dim, ragged,
    NULL, and zero vectors;
  * assign_cells min(struct) argmin vs the row_number window it replaced —
    including NULL distances (struct comparison orders NULL first, exactly
    like the window's asc NULLS FIRST);
  * dedup._agree_count_expr unroll vs the zip_with/filter/size count —
    full signatures, sentinel signatures, ragged and NULL arrays;
  * the perplexity n-gram explode over a materialized token column vs the
    inline-expression form it replaced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


VECS = [
    (1, [float(i) / 7.0 for i in range(64)]),
    (2, [float(63 - i) * 0.013 for i in range(64)]),
    (3, [0.0] * 64),                       # zero vector (NULL norm path)
    (4, [1.5] * 32),                       # ragged: shorter than 64
    (5, None),                             # NULL embedding
    (6, [(-1.0) ** i * 1e-3 * i for i in range(64)]),
    (7, [2.5] * 70),                       # longer than 64
]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(VECS, "vec_id int, embedding array<float>")


def test_dot_unrolled_bit_identical(spark, vec_df):
    from chinese_corpus_cleaning_spark.operators.similarity import (
        _dot,
        _dot_hof,
    )

    a = vec_df.select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("_va")
    )
    b = vec_df.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("_vb")
    )
    pairs = a.crossJoin(b).withColumn(
        "fast", F.expr(_dot("_va", "_vb"))
    ).withColumn("slow", F.expr(_dot_hof("_va", "_vb")))
    bad = pairs.where(~F.col("fast").eqNullSafe(F.col("slow"))).count()
    assert bad == 0


def test_assign_cells_argmin_matches_window(spark, vec_df):
    """The min(struct(d2, cid)) aggregate must pick exactly the row the old
    row_number window picked — ties on d2 break to the lower cid, NULL d2
    sorts first (so an all-NULL-distance vector lands on the min cid)."""
    from pyspark.sql.window import Window

    from chinese_corpus_cleaning_spark.operators.similarity import (
        assign_cells,
        seed_centroids,
    )

    cents = seed_centroids(vec_df, 3)
    got = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(vec_df, cents).collect()
    }
    # reference: the pre-round-8 window implementation, interpreted fold
    dist = (
        "aggregate(zip_with(v, c, (x, y) -> (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))), cast(0.0 as double),"
        " (acc, d) -> acc + d)"
    )
    pairs = (
        vec_df.select(F.col("vec_id"), F.col("embedding").alias("v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("d2", F.expr(dist))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("cid").asc()
    )
    want = {
        r["vec_id"]: r["cid"]
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    }
    assert got == want


# NOTE: an element_at-unrolled form of the dedup est-Jaccard agreement
# counts was pinned equal here in an earlier round-8 iteration, then the
# unroll itself was REVERTED by measurement (see _est_jaccard_exprs'
# docstring): the prefix prune already bounds the interpreted work and the
# ~300-term generated code cost seconds of compile per session.


def test_ngram_token_column_form_identical(spark):
    from chinese_corpus_cleaning_spark.operators.perplexity import (
        _ngram_expr,
        _ngrams_over_tokens_expr,
        _padded_tokens_expr,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x"), (3, ""), (4, None), (5, "a a a a a")],
        "doc_id int, text string",
    )
    inline = docs.select(
        "doc_id", F.explode(F.expr(_ngram_expr("text", 3))).alias("g")
    ).select("doc_id", "g.context", "g.word")
    cols = (
        docs.select(
            "doc_id", F.expr(_padded_tokens_expr("text", 3)).alias("__toks")
        )
        .select(
            "doc_id",
            F.explode(F.expr(_ngrams_over_tokens_expr("__toks", 3))).alias("g"),
        )
        .select("doc_id", "g.context", "g.word")
    )
    assert inline.exceptAll(cols).count() == 0
    assert cols.exceptAll(inline).count() == 0
