"""domain_quality_filter: host-level quality cut (RefinedWeb/FineWeb-style
content-farm screening) — integer-exact thresholds, host normalization,
malformed-URL tolerance, broadcast join-back plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from chinese_corpus_cleaning_spark.operators.textanalysis import (
    domain_quality_filter,
)

_SCHEMA = "doc_id long, url string, is_bad boolean"

_ROWS = [
    # spam.cn — 5 docs, 4 bad (80 %): flagged; spellings vary (case, port,
    # trailing FQDN dot) and must aggregate under ONE normalized host
    (1, "https://spam.cn/a", True),
    (2, "HTTPS://SPAM.CN:443/b", True),
    (3, "https://spam.cn./c", True),
    (4, "https://Spam.Cn/d", True),
    (5, "https://spam.cn/e", False),
    # mill.cn — 6 docs, exactly 3 bad (50 %): the bar is STRICT >, so not
    # flagged at max_bad_pct=50
    (6, "https://mill.cn/a", True),
    (7, "https://mill.cn/b", True),
    (8, "https://mill.cn/c", True),
    (9, "https://mill.cn/d", False),
    (10, "https://mill.cn/e", False),
    (11, "https://mill.cn/f", False),
    # good.cn — 5 docs, 0 bad
    (12, "https://good.cn/a", False),
    (13, "https://good.cn/b", False),
    (14, "https://good.cn/c", False),
    (15, "https://good.cn/d", False),
    (16, "https://good.cn/e", False),
    # farm.cn — 4 docs, 3 bad (75 %): under min_docs=5
    (17, "https://farm.cn/a", True),
    (18, "https://farm.cn/b", True),
    (19, "https://farm.cn/c", True),
    (20, "https://farm.cn/d", False),
    # parser tolerance: malformed URL and NULL URL -> NULL host, never
    # flagged, never a job failure
    (21, "not a url at all", True),
    (22, None, True),
]


def _run(spark, **kw):
    d = spark.createDataFrame(_ROWS, _SCHEMA)
    return {
        r["doc_id"]: r
        for r in domain_quality_filter(d, bad_expr="is_bad", **kw).collect()
    }


def test_flag_semantics(spark):
    out = _run(spark, min_docs=5, max_bad_pct=50)
    assert len(out) == 22  # nothing dropped, flags attached
    flagged = {k for k, r in out.items() if r["domain_flagged"]}
    assert flagged == {1, 2, 3, 4, 5}  # every spelling of spam.cn
    # normalization: one host, one count, audited on every member row
    assert {out[k]["host"] for k in flagged} == {"spam.cn"}
    assert all(out[k]["domain_n"] == 5 and out[k]["domain_bad"] == 4 for k in flagged)
    # unflagged hosts carry NULL audit columns
    assert out[6]["domain_n"] is None and not out[6]["domain_flagged"]
    # malformed/NULL URLs: NULL host, never flagged
    assert out[21]["host"] is None and not out[21]["domain_flagged"]
    assert out[22]["host"] is None and not out[22]["domain_flagged"]


def test_min_docs_boundary(spark):
    # farm.cn (4 docs, 75 %) enters at min_docs=4
    out = _run(spark, min_docs=4, max_bad_pct=50)
    assert {k for k, r in out.items() if r["domain_flagged"]} == {
        1, 2, 3, 4, 5, 17, 18, 19, 20,
    }


def test_strict_pct_boundary_is_integer_exact(spark):
    # spam.cn is 4/5 bad: 400 > 5*79 flags, 400 > 5*80 does not — the
    # decision is bigint arithmetic, no float ratio knife edge
    assert any(r["domain_flagged"] for r in _run(spark, max_bad_pct=79).values())
    assert not any(
        r["domain_flagged"] for r in _run(spark, max_bad_pct=80).values()
    )


def test_param_validation(spark):
    d = spark.createDataFrame(_ROWS[:1], _SCHEMA)
    with pytest.raises(ValueError):
        domain_quality_filter(d, bad_expr="is_bad", min_docs=0)
    with pytest.raises(ValueError):
        domain_quality_filter(d, bad_expr="is_bad", max_bad_pct=101)


def test_join_back_is_broadcast(spark):
    """The flagged-host set joins back broadcast by default: the document
    side crosses zero shuffles (only the slim (host, is_bad) pre-agg
    moves)."""
    d = spark.createDataFrame(_ROWS, _SCHEMA)
    buf = io.StringIO()
    with redirect_stdout(buf):
        domain_quality_filter(d, bad_expr="is_bad").explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
