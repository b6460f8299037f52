"""Round-5 operators: corpus-level boilerplate-line removal, Gopher cuts in
the composite keep, and crawl-frontier dedup (canonical-URL dedup + salted
per-host rollup)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from chinese_corpus_cleaning_spark.operators import textanalysis as ta


def _explained(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bp_docs(spark):
    """20 docs, each with: a unique lead line, a footer planted in ALL docs,
    a social line planted in half, and a unique tail."""
    rows = [
        (
            i,
            f"lead {i} unique\nCOPYRIGHT FOOTER\n"
            + ("follow us everywhere\n" if i % 2 == 0 else "")
            + f"tail {i}",
        )
        for i in range(20)
    ]
    return rows, None


def test_boilerplate_removed_everywhere_unique_survive(spark, bp_docs):
    rows, _ = bp_docs
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in ta.remove_boilerplate(d, min_doc_frac=0.3).collect()
    }
    for i in range(20):
        clean = out[i]["clean_text"]
        # the planted boilerplate is gone from EVERY doc
        assert "COPYRIGHT FOOTER" not in clean
        assert "follow us everywhere" not in clean
        # unique lines survive verbatim, in order
        assert clean == f"lead {i} unique\ntail {i}"
        assert out[i]["n_lines_removed"] == (2 if i % 2 == 0 else 1)


def test_boilerplate_threshold_absolute_and_empty_set(spark):
    d = spark.createDataFrame(
        [(1, "a\nb"), (2, "c\nd")], "doc_id long, text string"
    )
    # no line repeats across docs -> empty boilerplate set -> texts unchanged
    out = {r["doc_id"]: r for r in ta.remove_boilerplate(d, min_docs=2).collect()}
    assert out[1]["clean_text"] == "a\nb" and out[1]["n_lines_removed"] == 0
    # min_docs=1 marks every line boilerplate
    out1 = {r["doc_id"]: r for r in ta.remove_boilerplate(d, min_docs=1).collect()}
    assert out1[1]["clean_text"] == "" and out1[1]["n_lines_removed"] == 2
    with pytest.raises(ValueError):
        ta.remove_boilerplate(d)
    with pytest.raises(ValueError):
        ta.remove_boilerplate(d, min_docs=2, min_doc_frac=0.5)


def test_boilerplate_empty_lines_preserved(spark):
    """Empty lines never enter the frequency count (their digest can't become
    boilerplate) and survive removal untouched."""
    d = spark.createDataFrame(
        [(i, f"x{i}\n\nBOILER\n\ny{i}") for i in range(4)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ta.remove_boilerplate(d, min_docs=3).collect()}
    assert out[0]["clean_text"] == "x0\n\n\ny0"
    assert out[0]["n_lines_removed"] == 1


def test_gopher_pass_col_cuts(spark):
    """A doc over any single Gopher bound fails; a clean doc passes."""
    d = spark.createDataFrame(
        [
            # 4 lines, 2 dup -> dup_line_frac 0.5 > 0.30
            (1, "same line\nsame line\nsame line\nother text here now"),
            # one dominant bigram: "b b" repeated
            (2, " ".join(["b"] * 30)),
            # diverse prose
            (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    rep = ta.repetition_signals(d)
    out = {
        r["doc_id"]: r
        for r in rep.withColumn("gp", ta.gopher_pass_col()).collect()
    }
    assert out[1]["gp"] is False and out[1]["dup_line_frac"] == 0.5
    assert out[2]["gp"] is False and out[2]["top_bigram_frac"] == 1.0
    assert out[3]["gp"] is True


def test_crawl_frontier_matches_direct_and_salts_hot_host(spark):
    """One host at 30%: rollup matches the unsalted direct computation, and
    the FIRST aggregation's grouping keys include the salt column so the hot
    host spreads across reducers (no single-reducer hot key)."""
    rows = []
    for i in range(200):
        host = "hot.example.com" if i % 10 < 3 else f"site{i % 7}.example.com"
        # ~half the hot-host URLs collide pairwise after canonicalization
        path = f"/p/{i // 2}" if host == "hot.example.com" else f"/p/{i}"
        rows.append((i, f"HTTPS://{host.upper()}:443{path}"))
    d = spark.createDataFrame(rows, "doc_id long, url string")
    out = ta.crawl_frontier_dedup(d)

    direct = (
        ta.url_dedup(d)
        .select(
            F.regexp_extract(
                "canon_url", "^[a-z][a-z0-9+.-]*://([^/?]+)", 1
            ).alias("host"),
            "is_duplicate_url",
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.col("is_duplicate_url").cast("long")).alias("n_dup"),
        )
    )
    got = {r["host"]: (r["n_urls"], r["n_dup"]) for r in out.collect()}
    want = {r["host"]: (r["n_urls"], r["n_dup"]) for r in direct.collect()}
    assert got == want
    assert got["hot.example.com"][0] == 60

    plan = _explained(out)
    # the partial (host, salt) aggregate must appear before the host-only one
    agg_lines = [ln for ln in plan.splitlines() if "Keys" in ln and "host" in ln]
    assert any("salt" in ln for ln in agg_lines), plan
