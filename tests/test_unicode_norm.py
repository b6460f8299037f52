"""Unicode normalization (functions/unicode_norm.py): value-level
differential vs plain-Python unicodedata, width-fold coverage of the
whole FF01-FF5E block, NULL/empty edges, idempotence, and the
zero-shuffle plan shape."""

from __future__ import annotations

import unicodedata

import pytest

from chinese_corpus_cleaning_spark.functions.unicode_norm import (
    FULLWIDTH_DST,
    FULLWIDTH_SRC,
    normalize_text,
)

CASES = [
    (0, "plain ascii text"),
    (1, "ｆｕｌｌＷＩＤＴＨ　１２３！？（ｘ）"),          # full block sample + U+3000
    (2, "café dejà vu"),                      # combining marks -> compose
    (3, "é already composed"),                            # NFC identity
    (4, "中文不变 Ｍｉｘ ed é"),                    # CJK + both axes
    (5, ""),
    (6, None),
    (7, FULLWIDTH_SRC),                                   # the entire block
    (8, "́ leading orphan mark"),                    # mark with no base
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id bigint, text string")


def _ref(t):
    if t is None:
        return None
    folded = t.translate(dict(zip(map(ord, FULLWIDTH_SRC), FULLWIDTH_DST)))
    return unicodedata.normalize("NFC", folded)


def test_matches_python_reference(spark, docs):
    rows = {r["doc_id"]: r["norm_text"] for r in normalize_text(docs).collect()}
    for i, t in CASES:
        assert rows[i] == _ref(t), (i, t)


def test_full_block_folds_to_ascii(spark, docs):
    rows = {r["doc_id"]: r["norm_text"] for r in normalize_text(docs).collect()}
    assert rows[7] == FULLWIDTH_DST
    assert rows[7].isascii()


def test_combining_sequences_compose(spark, docs):
    rows = {r["doc_id"]: r["norm_text"] for r in normalize_text(docs).collect()}
    assert rows[2] == "café dejà vu"
    assert len(rows[2]) == len(CASES[2][1]) - 2


def test_idempotent(spark, docs):
    once = normalize_text(docs)
    twice = normalize_text(once, text_col="norm_text", out_col="norm2")
    assert all(
        r["norm_text"] == r["norm2"] for r in twice.collect()
    )


def test_fold_width_off_keeps_fullwidth(spark, docs):
    rows = {
        r["doc_id"]: r["norm_text"]
        for r in normalize_text(docs, fold_width=False).collect()
    }
    assert rows[1] == unicodedata.normalize("NFC", CASES[1][1])
    assert not rows[1].isascii()


def test_bad_form_raises(spark, docs):
    with pytest.raises(ValueError):
        normalize_text(docs, form="NFX")


def test_plan_is_shuffle_free(spark, docs):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        normalize_text(docs).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan
