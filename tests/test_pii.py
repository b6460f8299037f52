"""Regex PII scrub: three-engine agreement (Python re.ASCII twin == Spark/
Java == DuckDB/RE2), semantics pins (reference fixture phone, full-width
fold, boundary rules), and plan shape (pure map-side native projection).

The boundary spellings deliberately differ per dialect (Java's \\b is
Unicode-aware — a measured JDK asymmetry — so Spark gets explicit ASCII
lookarounds); these tests are what make that split safe to maintain.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from chinese_corpus_cleaning_spark.functions.pii import (
    EMAIL_TOKEN,
    ID_TOKEN,
    IP_TOKEN,
    PHONE_TOKEN,
    REASON_ORDER,
    URL_TOKEN,
    fold_width,
    mask_pii,
    pii_columns,
    pii_sql_chain,
)
from chinese_corpus_cleaning_spark.operators.quality import pii_scrub, with_pii

# Adversarial corpus: CJK adjacency (the Java-\b landmine), full-width
# digits, back-to-back occurrences, digit-glued and letter-glued non-PII,
# PII inside URLs, lowercase ID check char (post-DFA-scrub shape), empties.
CASES = [
    # the reference's own ad-spam fixtures (test_filter.py:104,117)
    "联系电话：13917340054，添加微信享受更多折扣。访问我们的官网www.example.com，或扫码关注。",
    "联系电话：13888888888，添加微信了解更多。",
    "13917340054,13888888888",
    "id 110101199003077578 and 11010119900307757X ok",
    "no pii here at all",
    "full-width １３９１７３４００５４ phone",
    "embedded a13917340054b and 1391734005412 too long",
    "url https://promo.example.com/p/13917340054?q=1 covers the phone",
    "bare domain promo-site.cn and example.comX tail",
    "scrubbed lowercase id 11010119900307757x after dfa",
    "电话13917340054句末",
    "身份证110101199003077578。",
    "X110101199003078578 letterfront",
    "222 13917340054222 digitglue",
    "＿13917340054 fullwidth-underscore-is-not-ascii-word",
    "mixed １３9１7340054 widths glue into one phone",
    "bad month 110101199013077578 and bad day 110101199003327578",
    "12917340054 not a mobile prefix",
    "http://a.b/x?y=1&z=2#frag plus www.x-y.com/p+q more",
    # email / IP (round-7 Dolma classes)
    "邮箱contact.me+tag@mail-server.example.com结尾",
    "write a@b.co or A_1%x@sub.domain.cn, thanks",
    ".leading@dot.com needs alnum start; mid a@b tldless",
    "userinfo https://user@host.example.com/x masks the email part",
    "server 10.0.255.1端口 and 255.255.255.255 edge",
    "not ip 256.1.1.1 and versionish v1.2.3.4 and 1.2.3.4.5 run",
    "full-width ip １０.２.３.４ folds then masks",
    "ports 192.168.0.1:8080 ok",
    None,
    "",
]


def test_mask_pii_fixture_semantics():
    m, reasons, counts = mask_pii(CASES[0])
    assert PHONE_TOKEN in m and URL_TOKEN in m
    assert reasons == ["phone", "url"]
    assert counts == {
        "url": 1, "id_number": 0, "phone": 1, "email": 0, "ip": 0,
    }
    # back-to-back phones both mask in ONE pass (zero-width boundaries)
    assert mask_pii("13917340054,13888888888")[0] == "<PHONE>,<PHONE>"
    # full-width folds then masks; the fold itself is visible in output
    assert mask_pii("电话１３９１７３４００５４！")[0] == "电话<PHONE>！"
    # ID: X and x check chars; invalid month/day shapes do NOT mask
    assert mask_pii("11010119900307757X")[0] == ID_TOKEN
    assert mask_pii("11010119900307757x")[0] == ID_TOKEN
    assert mask_pii("110101199013077578")[0] == "110101199013077578"
    # digit/letter-glued candidates do not mask (ASCII-word boundary)
    assert mask_pii("a13917340054")[0] == "a13917340054"
    assert mask_pii("1391734005412")[0] == "1391734005412"
    # phone inside a URL is masked as part of the URL, counted once
    m, reasons, counts = mask_pii("https://x.cn/13917340054")
    assert m == URL_TOKEN and reasons == ["url"]
    assert fold_width("０9８") == "098"


def test_mask_pii_email_and_ip_semantics():
    # email masks whole, CJK-adjacent, before the bare-domain URL arm
    m, reasons, _ = mask_pii("邮箱contact.me+tag@mail-server.example.com结尾")
    assert m == f"邮箱{EMAIL_TOKEN}结尾" and reasons == ["email"]
    # an email's domain must NOT degrade to '<URL>' (the ordering point)
    assert URL_TOKEN not in mask_pii("a@b.co done")[0]
    # alnum-start rule: a leading dot keeps the boundary sound
    m, _, counts = mask_pii(".leading@dot.com x")
    assert m == f".{EMAIL_TOKEN} x" and counts["email"] == 1
    # tld-less a@b does not mask
    assert mask_pii("mid a@b tldless")[0] == "mid a@b tldless"
    # userinfo URL: email rule eats the user@host part (documented)
    m, _, _ = mask_pii("https://user@host.example.com/x")
    assert EMAIL_TOKEN in m
    # IP: octet-exact, CJK-adjacent, full-width folds first
    assert mask_pii("server 10.0.255.1端口")[0] == f"server {IP_TOKEN}端口"
    assert mask_pii("１０.２.３.４")[0] == IP_TOKEN
    assert mask_pii("256.1.1.1")[0] == "256.1.1.1"  # 256 not an octet...
    # ...but its valid 4-octet TAIL '6.1.1.1' has a clean boundary? no —
    # '6' is digit-glued to '25' (ASCII-word boundary), so nothing masks
    assert mask_pii("v1.2.3.4")[0] == "v1.2.3.4"  # letter-glued
    m, _, counts = mask_pii("1.2.3.4.5 run")
    assert counts["ip"] == 1 and m.startswith(IP_TOKEN)  # first quad, as
    # published regex sets behave
    assert mask_pii("192.168.0.1:8080")[0] == f"{IP_TOKEN}:8080"
    # reason order is pinned
    assert list(REASON_ORDER) == ["phone", "id_number", "url", "email", "ip"]


def test_spark_matches_python_twin(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "i long, t string"
    )
    rows = (
        df.select("i", *(v.alias(k) for k, v in pii_columns("t").items()))
        .orderBy("i")
        .collect()
    )
    for c, r in zip(CASES, rows):
        m, reasons, counts = mask_pii(c)
        assert r["pii_text"] == m, c
        assert list(r["pii_reasons"]) == reasons, c
        assert tuple(r[f"n_{k}"] for k in REASON_ORDER) == tuple(
            counts[k] for k in REASON_ORDER
        ), c


def test_duckdb_matches_python_twin():
    con = duckdb.connect()
    chain = pii_sql_chain("t")
    cols = ", ".join(f"{chain[f'n_{k}']} as n_{k}" for k in REASON_ORDER)
    sql = (
        f"select {chain['pii_text']} as m, {cols} "
        "from (select ?::varchar as t)"
    )
    for c in CASES:
        row = con.execute(sql, [c]).fetchone()
        dm, got = row[0], row[1:]
        m, _, counts = mask_pii(c)
        assert dm == m, c
        # NULL text counts 0 (coalesced), matching mask_pii/pii_columns
        assert got == tuple(counts[k] for k in REASON_ORDER), c


def test_pii_composes_after_scrub_without_touching_it(spark):
    """with_pii on scrubbed_text must leave the byte-parity scrub column
    untouched and mask the lowercase-x ID the scrub produces."""
    from chinese_corpus_cleaning_spark.functions.dfa import build_trie
    from chinese_corpus_cleaning_spark.operators.quality import scrub_udf

    docs = spark.createDataFrame(
        [
            (1, "Call 13917340054 about SPARK and ID 11010119900307757X now"),
            (2, "plain vector text"),
        ],
        "doc_id long, text string",
    )
    bc = spark.sparkContext.broadcast(build_trie(["spark", "vector"]))
    scrubbed = docs.select(
        "doc_id", scrub_udf(bc)(F.col("text")).alias("scrubbed_text")
    )
    before = {r["doc_id"]: r["scrubbed_text"] for r in scrubbed.collect()}
    out = {r["doc_id"]: r for r in with_pii(scrubbed).collect()}
    assert out[1]["scrubbed_text"] == before[1]  # untouched by composition
    assert "*****" in before[1]  # DFA did scrub
    assert PHONE_TOKEN in out[1]["pii_text"] and ID_TOKEN in out[1]["pii_text"]
    assert "x" not in out[1]["pii_text"].split(ID_TOKEN)[1][:1]
    assert list(out[1]["pii_reasons"]) == ["phone", "id_number"]
    assert list(out[2]["pii_reasons"]) == []


def test_pii_scrub_plan_is_mapside_native(spark):
    """No shuffle, no Python eval: the operator must be a single projection
    over the scan (100 TB shape: pure map-side, codegen-eligible)."""
    docs = spark.createDataFrame([(1, "x 13917340054")], "doc_id long, text string")
    plan = (
        pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_pii_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["pii_text"] is None and list(out[1]["pii_reasons"]) == []
    assert out[1]["n_phone"] == 0 and out[1]["n_url"] == 0
    assert out[2]["pii_text"] == "" and list(out[2]["pii_reasons"]) == []


def test_fullwidth_check_char_folds(spark):
    """A resident ID written entirely full-width — including the Ｘ/ｘ
    check character — must fold and mask in all three engines (review
    finding: the fold covered digits only, so the [0-9Xx] tail never
    matched and the ID leaked unmasked)."""
    import duckdb

    from chinese_corpus_cleaning_spark.functions.pii import (
        mask_pii,
        pii_columns,
        pii_sql_chain,
    )

    fw_digits = str.maketrans("0123456789", "０１２３４５６７８９")
    base = "11010119900101123"
    for check in ("Ｘ", "ｘ"):
        text = "身份证" + base.translate(fw_digits) + check + "。"
        masked, reasons, _counts = mask_pii(text)
        assert "id_number" in reasons, text
        assert base not in masked and check not in masked
        # Spark twin
        df = spark.createDataFrame([(text,)], "text string")
        row = df.select(
            *(v.alias(k) for k, v in pii_columns("text").items())
        ).collect()[0]
        assert row["n_id_number"] == 1 and row["pii_text"] == masked
        # DuckDB twin
        chain = pii_sql_chain("t")
        got = duckdb.sql(
            f"select {chain['pii_text']} as p from (select '{text}' as t)"
        ).fetchone()[0]
        assert got == masked
