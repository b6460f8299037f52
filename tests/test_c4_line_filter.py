"""c4_line_filter: C4-style line cleanup semantics (Raffel et al. 2020) —
terminal punctuation (incl. CJK), min words per line, page-level flags."""

from __future__ import annotations

from chinese_corpus_cleaning_spark.operators.textanalysis import (
    c4_line_filter,
)


def test_c4_line_and_page_semantics(spark):
    d = spark.createDataFrame(
        [
            (
                1,
                "This is a good sentence.\nshort.\nno terminal punct here\n"
                "Another fine long sentence!\nthird keeper sentence here?",
            ),
            (2, "这 是 中文 句子 。\n另 一 个 好 句子 ！\n短 。\n第三 个 句子 吗 ？"),
            (
                3,
                "var x = {a: 1}.\nuses javascript here.\n"
                "Lorem Ipsum dolor sit amet.\nGood line one here.\n"
                "Good line two here.\nGood line three here.",
            ),
            (4, None),
            (5, "Only two good lines here.\nAnd the second one here."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_filter(d).collect()}
    assert len(out) == 5
    # doc 1: 'short.' fails min_words, the punct-less line fails terminal
    assert out[1]["n_lines_kept"] == 3 and out[1]["page_keep"]
    assert "no terminal punct" not in out[1]["clean_text"]
    # doc 2: CJK terminal marks count; '短 。' fails min_words
    assert out[2]["n_lines_kept"] == 3 and out[2]["page_keep"]
    # doc 3: javascript line dropped; page poisoned by brace + lorem ipsum
    assert "javascript" not in out[3]["clean_text"]
    assert not out[3]["page_keep"]
    # doc 4: NULL text behaves as '' (no crash, nothing kept)
    assert out[4]["n_lines_kept"] == 0 and not out[4]["page_keep"]
    assert out[4]["clean_text"] == ""
    # doc 5: both lines keep, but < min_lines_kept -> page dropped
    assert out[5]["n_lines_kept"] == 2 and not out[5]["page_keep"]


def test_c4_javascript_word_boundary(spark):
    """C4 drops lines with the WORD javascript (published rule), not the
    substring: 'javascripts' survives; 'JavaScript教程' is dropped (教 is
    not an ASCII word char) — the explicit-ASCII-lookaround spelling the
    Unicode-aware Java \\b would get wrong."""
    d = spark.createDataFrame(
        [
            (1, "we enable javascript on this page.\nA clean keeper line here."),
            (2, "these javascripts are plural words.\nA clean keeper line here."),
            (3, "阅读 这个 JavaScript教程 文档 。\nA clean keeper line here."),
            (4, "my_javascript var is snake case.\nA clean keeper line here."),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in c4_line_filter(d, min_lines_kept=1).collect()
    }
    assert out[1]["n_lines_kept"] == 1  # word match -> dropped
    assert out[2]["n_lines_kept"] == 2  # plural is a different word
    assert out[3]["n_lines_kept"] == 1  # CJK neighbor is a boundary
    assert out[4]["n_lines_kept"] == 2  # '_' suppresses the boundary


def test_c4_crlf_normalized(spark):
    """CRLF pages: trailing \\r must not defeat the terminal-punct anchor
    (and must not survive into clean_text) — the Java-$ vs RE2-$ split."""
    d = spark.createDataFrame(
        [(1, "First good line here.\r\nSecond good line here!\r\nThird good line here?\r\n")],
        "doc_id long, text string",
    )
    r = c4_line_filter(d).first()
    assert r["n_lines_kept"] == 3 and r["page_keep"]
    assert "\r" not in r["clean_text"]


def test_c4_min_chars_cjk_adaptation(spark):
    """Unsegmented Chinese (one whitespace token per line) fails the
    English-centric word rule; min_chars admits it without loosening the
    terminal-punctuation requirement."""
    d = spark.createDataFrame(
        [(1, "这是一个完整的中文句子没有空格。\n第二个完整句子也没有空格！\n第三个句子在这里吗？\n短。\n没有标点的行")],
        "doc_id long, text string",
    )
    strict = c4_line_filter(d).first()
    assert strict["n_lines_kept"] == 0  # word rule rejects everything
    cjk = c4_line_filter(d, min_chars=8).first()
    # three long terminal-punct lines keep; '短。' (2 chars) and the
    # punct-less line still drop
    assert cjk["n_lines_kept"] == 3 and cjk["page_keep"]
    assert "短" not in cjk["clean_text"] and "没有标点" not in cjk["clean_text"]


def test_c4_word_count_is_whitespace_run_based(spark):
    """min_words counts runs of non-whitespace over the full Python-\\s
    set (review finding: the old single-space split counted 'Hi  there.'
    as 3 words via the empty middle segment, and merged tab-separated
    words into one)."""
    d = spark.createDataFrame(
        [
            (1, "Hi  there."),          # 2 words (double space) -> drop
            (2, "foo\tbar\tbaz."),       # 3 tab-separated words -> keep
            (3, "one two　three."),  # U+3000 separates -> 3 words
            (4, "a  b  c  d."),          # 4 words despite double spaces
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_lines_kept"] for r in c4_line_filter(d).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 1}
