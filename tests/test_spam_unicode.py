"""Pin the portable (Java regex / RE2) rewrites of Python's \\d and \\s used
by functions/spam.py's relational path.

Python `re` on str patterns gives \\d = Unicode category Nd (includes
full-width １２３) and \\s = a fixed whitespace codepoint set (includes
U+3000 ideographic space) — both common in Chinese web text. Java regex and
DuckDB's RE2 default \\d/\\s to ASCII, so has_spam_col and the DuckDB oracle
use SPAM_PATTERNS_PORTABLE (\\p{Nd} + an explicit \\x{...} class). These
tests pin (a) the explicit class against a full-codespace enumeration of
Python's \\s, and (b) three-engine agreement (Python re / Java via Spark /
RE2 via DuckDB) on every pattern over unicode-digit/space atoms.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from chinese_corpus_cleaning_spark.functions.spam import (
    PY_WS_CLASS,
    SPAM_PATTERNS,
    SPAM_PATTERNS_PORTABLE,
)


def _class_codepoints(cls: str) -> set[int]:
    """Expand the \\x{..} character class literal into its codepoint set."""
    body = cls[1:-1]
    pts: list[int] = []
    for m in re.finditer(r"\\x\{([0-9a-f]+)\}|(-)|(.)", body):
        if m.group(1):
            pts.append(int(m.group(1), 16))
        elif m.group(2):
            pts.append(-1)  # range marker
        else:
            pts.append(ord(m.group(3)))
    out: set[int] = set()
    i = 0
    while i < len(pts):
        if i + 2 < len(pts) and pts[i + 1] == -1:
            out.update(range(pts[i], pts[i + 2] + 1))
            i += 3
        else:
            out.add(pts[i])
            i += 1
    return out


def test_ws_class_equals_python_whitespace_set():
    python_ws = {cp for cp in range(0x110000) if re.match(r"\s", chr(cp))}
    assert _class_codepoints(PY_WS_CLASS) == python_ws


def test_portable_patterns_cover_all_originals():
    assert len(SPAM_PATTERNS_PORTABLE) == len(SPAM_PATTERNS)
    assert not any(r"\d" in p or r"\s" in p for p in SPAM_PATTERNS_PORTABLE)


# Atoms chosen to exercise every pattern plus the unicode digit/space edges.
_TEXTS = [
    "1区2",
    "１区２",          # full-width digits (Nd)
    "٣区٤",            # Arabic-Indic digits (Nd)
    "1　区　2",        # U+3000 ideographic space
    "1 区 2",          # NBSP U+00A0
    "1\u2009区\u20092",  # thin space
    "a区b",            # letters are not \d anywhere
    "在线播放",
    "在线　播放",
    "在线 播放",
    "视频一区二区",
    "久久久",
    "不卡 一区 二区",
    "精品\u3000视频\u3000在线",
    "日本 韩国 欧美",
    "激情小说",
    "成人\t视频",
    "在线\n观看",
    "一本　道",
    "中文 字幕",
    "normal english text",
    "正常的中文文本",
]


@pytest.mark.parametrize("i", range(len(SPAM_PATTERNS)))
def test_three_engine_regex_agreement(spark, i):
    py_pat = re.compile(SPAM_PATTERNS[i])
    portable = SPAM_PATTERNS_PORTABLE[i]
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(t,) for t in _TEXTS], ["text"]
    ).withColumn("m", F.regexp_like("text", F.lit(portable)))
    spark_res = {r["text"]: r["m"] for r in df.collect()}
    for t in _TEXTS:
        expect = bool(py_pat.search(t))
        assert spark_res[t] == expect, (SPAM_PATTERNS[i], t, "java")
        duck = con.execute(
            "select regexp_matches(?, ?)", [t, portable]
        ).fetchone()[0]
        assert duck == expect, (SPAM_PATTERNS[i], t, "re2")
