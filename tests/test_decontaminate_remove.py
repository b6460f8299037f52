"""Span-removal decontamination (textanalysis.decontaminate_remove):
driver-side reference differential, agreement with the detect operator,
pad/merge/full-mask edges, NULL/short/empty inputs, and the
Exchange-free plan shape."""

from __future__ import annotations

import hashlib

import pytest

from chinese_corpus_cleaning_spark.operators.textanalysis import (
    decontaminate_overlap,
    decontaminate_remove,
)

PASSAGE = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
SALAD = [
    "one two three four five six seven eight nine ten eleven twelve",
    "red green blue cyan magenta yellow black white gray pink",
    "cat dog fox owl elk bee ant ram yak emu hen sow",
]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _ref_remove(text, bench_texts, n=8, pad=2):
    bset = set()
    for bt in bench_texts:
        toks = bt.split(" ")
        for i in range(len(toks) - n + 1):
            bset.add(_h(" ".join(toks[i : i + n])))
    if text is None:
        return None, 0, 0, 0
    toks = text.split(" ")
    starts = [
        i
        for i in range(len(toks) - n + 1)
        if _h(" ".join(toks[i : i + n])) in bset
    ]
    mask = [False] * len(toks)
    for i in starts:
        for j in range(max(0, i - pad), min(len(toks), i + n + pad)):
            mask[j] = True
    spans = sum(
        1 for j in range(len(toks)) if mask[j] and (j == 0 or not mask[j - 1])
    )
    return (
        " ".join(t for t, m in zip(toks, mask) if not m),
        len(starts),
        spans,
        sum(mask),
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, SALAD[0]),                                       # untouched
        (1, f"{SALAD[1].split(' ', 3)[3]} {PASSAGE} {SALAD[1]}"),  # spliced
        (2, PASSAGE),                                        # fully masked
        (3, f"{SALAD[2]} {PASSAGE}"),                        # tail splice
        (4, "short doc"),                                    # < n tokens
        (5, ""),
        (6, None),
        (7, f"{PASSAGE} middle words here {PASSAGE}"),       # two spans
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame([(100, PASSAGE)], "doc_id bigint, text string")


def test_matches_reference(spark, corpus, bench):
    got = {r["doc_id"]: r for r in decontaminate_remove(corpus, bench).collect()}
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for did, text in texts.items():
        want = _ref_remove(text, [PASSAGE])
        r = got[did]
        assert (
            r["cleaned_text"],
            r["n_matches"],
            r["n_spans_removed"],
            r["n_tokens_removed"],
        ) == want, did
        assert r["contaminated"] == (want[1] > 0)


def test_agrees_with_detect_flag(spark, corpus, bench):
    rem = {r["doc_id"]: r["contaminated"] for r in decontaminate_remove(corpus, bench).collect()}
    det = {r["doc_id"]: r["contaminated"] for r in decontaminate_overlap(corpus, bench).collect()}
    assert rem == det


def test_pad_expands_and_merges(spark, bench):
    # pad=2 eats 2 salad tokens on each side of the planted passage
    d = spark.createDataFrame(
        [(1, f"a b c d {PASSAGE} w x y z")], "doc_id bigint, text string"
    )
    r = decontaminate_remove(d, bench, pad=2).collect()[0]
    assert r["cleaned_text"] == "a b y z"
    assert r["n_spans_removed"] == 1
    r0 = decontaminate_remove(d, bench, pad=0).collect()[0]
    assert r0["cleaned_text"] == "a b c d w x y z"


def test_two_separated_spans(spark, corpus, bench):
    r = {x["doc_id"]: x for x in decontaminate_remove(corpus, bench).collect()}[7]
    # "middle words here" is 3 tokens; pad 2 from both sides masks 2+2 of
    # them -> the middle hole merges? pad eats 'middle','words' from the
    # left span and 'words','here' from the right: union masks all three
    # -> ONE contiguous masked run.
    assert r["cleaned_text"] == ""
    assert r["n_spans_removed"] == 1
    assert r["n_matches"] == 2


def test_fully_masked_doc_yields_empty_string(spark, corpus, bench):
    r = {x["doc_id"]: x for x in decontaminate_remove(corpus, bench).collect()}[2]
    assert r["cleaned_text"] == "" and r["contaminated"]


def test_null_and_short_and_empty(spark, corpus, bench):
    got = {r["doc_id"]: r for r in decontaminate_remove(corpus, bench).collect()}
    assert got[6]["cleaned_text"] is None and not got[6]["contaminated"]
    assert got[4]["cleaned_text"] == "short doc"
    assert got[5]["cleaned_text"] == ""


def test_empty_benchmark_is_identity(spark, corpus):
    empty = corpus.sparkSession.createDataFrame([], "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in decontaminate_remove(corpus, empty).collect()}
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for did, text in texts.items():
        assert got[did]["cleaned_text"] == text
        assert not got[did]["contaminated"]


def test_plan_is_exchange_free(spark, corpus, bench):
    import io
    from contextlib import redirect_stdout

    out = decontaminate_remove(corpus, bench)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_partitioning_invariance(spark, corpus, bench):
    a = decontaminate_remove(corpus.repartition(5), bench).collect()
    b = decontaminate_remove(corpus.coalesce(1), bench).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
