"""pack_sequences: two-phase bucket-prefix packing must equal the naive
global-window spec; shard arithmetic invariants; bucket-count invariance;
CJK-aware token semantics (round-7 default)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from chinese_corpus_cleaning_spark.operators.dedup import _h60_sql
from chinese_corpus_cleaning_spark.operators.sampling import (
    pack_sequences,
    token_count_sql,
)
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
        F.expr(token_count_sql("text")).cast("long").alias("n"),
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
    """n_buckets is a physical knob only — results must be identical,
    including the derived default (n_buckets=None)."""
    d = _docs(spark, 200)
    a = sorted(map(tuple, pack_sequences(d, budget=64, n_buckets=4).collect()))
    b = sorted(map(tuple, pack_sequences(d, budget=64, n_buckets=64).collect()))
    c = sorted(map(tuple, pack_sequences(d, budget=64).collect()))
    assert a == b == c


def test_cjk_token_semantics(spark):
    """The round-7 default budget unit: a pure-Chinese doc's n_tokens is
    its CHARACTER count (whitespace split would call it 1 token — the
    verdict-named wrong-in-practice case); mixed text counts CJK chars +
    whitespace words over the residue; adjacency around CJK runs splits."""
    zh = "训练数据管线需要正确的序列打包预算单位"  # 19 chars, no spaces
    rows = spark.createDataFrame(
        [
            (1, zh),
            (2, "hello world"),  # pure ASCII: 2 words
            (3, "abc中def"),  # 1 CJK + 2 residue words (adjacency splits)
            (4, "中文 字符"),  # 4 CJK, residue is only whitespace -> 0
            (5, None),  # NULL text -> 0 tokens in cjk mode
            (6, ""),  # empty -> 0
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in pack_sequences(rows, budget=8, n_buckets=4).collect()
    }
    assert out[1] == len(zh) == 19
    assert out[2] == 2
    assert out[3] == 3
    assert out[4] == 4
    assert out[5] == 0 and out[6] == 0
    # whitespace mode keeps the pre-round-7 semantics (NULL -> '' -> 1)
    ws = {
        r["doc_id"]: r["n_tokens"]
        for r in pack_sequences(
            rows, budget=8, n_buckets=4, token_count="whitespace"
        ).collect()
    }
    assert ws[1] == 1 and ws[2] == 2 and ws[5] == 1
    # token_count_expr overrides both modes
    fixed = {
        r["doc_id"]: r["n_tokens"]
        for r in pack_sequences(
            rows, budget=8, n_buckets=4, token_count_expr="7"
        ).collect()
    }
    assert set(fixed.values()) == {7}
    with pytest.raises(ValueError):
        token_count_sql("text", "bogus")


def test_cjk_token_multiline_whitespace(spark):
    """Separators are the FULL Python-\\s set, not literal spaces: curation
    text is newline-joined (clean_text/paragraph array_join), so '\\n'
    between two CJK blocks must contribute ZERO residue tokens, '\\n'
    between Latin words must SPLIT them, and U+3000/NBSP (common in
    Chinese webtext) must separate like ASCII space. Review finding:
    the pre-fix space-only trim/split counted '中文\\n汉字' as 5."""
    rows = spark.createDataFrame(
        [
            (1, "中文\n汉字"),  # 4 CJK + 0 residue (newline is not a token)
            (2, "one two\nthree four"),  # 4 words (newline splits)
            (3, "中文 abc\tdef　ghi"),  # 2 CJK + 3 residue words
            (4, " \n\t　 "),  # whitespace-only -> 0
            (5, " x y　"),  # exotic separators -> 2 words
            (6, "纯中文第一行\n第二行"),  # 9 CJK, 0 residue
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in pack_sequences(rows, budget=8, n_buckets=4).collect()
    }
    assert out == {1: 4, 2: 4, 3: 5, 4: 0, 5: 2, 6: 9}


def test_zero_token_docs_get_empty_collapsed_span(spark):
    """Zero-token docs (NULL/whitespace text) must not emit shard -1 or
    an inverted [first, first-1] span (review finding): their span
    collapses to shard_last == shard_first at the position the next
    token would occupy, so an exporter slicing [first..last] inclusive
    still visits each shard exactly once."""
    rows = spark.createDataFrame(
        [(1, None), (2, "一二三四五六七八"), (3, "   "), (4, "九十")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(rows, budget=4, n_buckets=4).collect()
    }
    for i in (1, 3):
        r = out[i]
        assert r["n_tokens"] == 0
        assert r["shard_last"] == r["shard_first"] >= 0
    for i in (2, 4):
        r = out[i]
        assert r["shard_last"] >= r["shard_first"] >= 0
    # total order/coverage: max shard_last covers the 10 packed tokens
    assert max(r["shard_last"] for r in out.values()) == (10 - 1) // 4
