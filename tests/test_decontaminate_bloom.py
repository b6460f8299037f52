"""decontaminate_bloom: the zero-shuffle bloom-filter twin of the gated
decontaminate_overlap — one-sided error (never a false negative), identical
gram hashing, Exchange-free probe plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from chinese_corpus_cleaning_spark.operators.textanalysis import (
    decontaminate_bloom,
    decontaminate_overlap,
)

_N = 4  # small n so the fixture windows are easy to plant


def _tok(i: int, j: int) -> str:
    return f"w{i}x{j}"


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 docs of 12 unique tokens each; docs 0-9 embed a benchmark window
    rows = []
    for i in range(40):
        toks = [_tok(i, j) for j in range(12)]
        if i < 10:
            toks[4:8] = [f"bench{i}a", f"bench{i}b", f"bench{i}c", f"bench{i}d"]
        rows.append((i, " ".join(toks)))
    rows.append((90, None))  # NULL text
    rows.append((91, "only three tokens"))  # < n tokens: no grams
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def bench(spark):
    rows = [
        (i, " ".join([f"bench{i}a", f"bench{i}b", f"bench{i}c", f"bench{i}d"]))
        for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_agrees_with_exact_at_low_fpp(spark, corpus, bench):
    """At fpp=1e-6 over a tiny gram universe the bloom answer equals the
    exact operator's bit for bit (both are deterministic, so this is a
    stable assertion, not a probabilistic one)."""
    exact = {
        r["doc_id"]: r
        for r in decontaminate_overlap(corpus, bench, n=_N).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in decontaminate_bloom(corpus, bench, n=_N, fpp=1e-6).collect()
    }
    assert set(exact) == set(bloom) == {*range(40), 90, 91}
    for i in exact:
        assert exact[i]["contaminated"] == bloom[i]["contaminated"], i
        assert exact[i]["n_overlap"] == bloom[i]["n_overlap"], i
    assert {i for i in bloom if bloom[i]["contaminated"]} == set(range(10))
    assert bloom[90]["n_overlap"] == 0 and bloom[91]["n_overlap"] == 0


def test_superset_even_at_absurd_fpp(spark, corpus, bench):
    """One-sided error: whatever fpp, every exact hit is a bloom hit and
    per-doc bloom counts dominate exact counts."""
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate_overlap(corpus, bench, n=_N).collect()
    }
    bloom = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate_bloom(corpus, bench, n=_N, fpp=0.5).collect()
    }
    assert all(bloom[i] >= exact[i] for i in exact)


def test_probe_plan_is_exchange_free(spark, corpus, bench):
    """The corpus-side probe is ONE mapInPandas: no explode of the big
    side, no join, no shuffle anywhere in the returned plan."""
    out = decontaminate_bloom(corpus, bench, n=_N, fpp=1e-4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_empty_sides_and_validation(spark, corpus, bench):
    empty = spark.createDataFrame([], "doc_id long, text string")
    # empty benchmark: all-zero bitmap, nothing flags
    out = decontaminate_bloom(corpus, empty, n=_N).collect()
    assert len(out) == 42 and not any(r["contaminated"] for r in out)
    # empty corpus flows through
    assert decontaminate_bloom(empty, bench, n=_N).count() == 0
    with pytest.raises(ValueError):
        decontaminate_bloom(corpus, bench, fpp=0.0)
