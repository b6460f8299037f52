"""Extraction-stage operators: HTML -> text, whitespace cleaning, language ID,
long-repeat removal — the rebuild of the reference's ingest path (E3,
SURVEY.md §3: subsample_warc_warc.py + convert_warc_to_htmls.py collapsed into
column derivations over docs(html))."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..functions.cleaning import (
    clean_text,
    clean_text_whitelist,
    extract_html_text,
    remove_long_repeated_substrings,
    remove_long_repeated_substrings_ex,
)
from ..functions import langid as _langid

# Portable regex classes shared VERBATIM with the extract_is_zh DuckDB
# oracle (plans/oracles.py imports these — the repo convention: twins are
# built from ONE constant so the engines cannot drift; review finding:
# these were hand-duplicated string literals in both files). \x{..}
# syntax is valid in Java regex AND RE2.
CTRL_CLASS_PORTABLE = "[\\x{00}-\\x{08}\\x{0b}\\x{0c}\\x{0e}-\\x{1f}\\x{7f}]"
CJK_CLASS_PORTABLE = "[\\x{4e00}-\\x{9fff}]"


LANG_SCHEMA = StructType(
    [
        StructField("lang_pred", StringType()),
        StructField("lang_conf", DoubleType()),
        StructField("is_zh", BooleanType()),
    ]
)


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """html binary/string -> cleaned text (tool.py:38-63 semantics)."""
    return html.map(extract_html_text)


@F.pandas_udf(StringType())
def clean_ws(texts: pd.Series) -> pd.Series:
    """whitespace/control cleanup (tool.py:8-14)."""
    return texts.map(lambda t: None if t is None else clean_text(t))


@F.pandas_udf(StringType())
def clean_whitelist(texts: pd.Series) -> pd.Series:
    """charset-whitelist cleanup (clear_redundancy.py:15-51)."""
    return texts.map(lambda t: None if t is None else clean_text_whitelist(t))


REPEATS_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("fell_back", BooleanType()),
    ]
)


@F.pandas_udf(REPEATS_SCHEMA)
def remove_repeats_ex(texts: pd.Series) -> pd.DataFrame:
    """suffix-automaton long-repeat removal (clear_redundancy.py:104-170).
    O(n) states per doc; confined to the extraction stage like the reference
    (convert_warc_to_htmls.py:42-45). ``fell_back`` is True iff the doc blew
    the exact automaton's work budget and took the approximate chunk-dedup
    path — the byte-identical-to-reference guarantee holds only when False,
    so a 100 TB run can quantify (and audit) the approximate-path rate."""
    rows = [
        {"text": None, "fell_back": False}
        if t is None
        else dict(zip(("text", "fell_back"), remove_long_repeated_substrings_ex(t)))
        for t in texts
    ]
    return pd.DataFrame(rows, columns=["text", "fell_back"])


@F.pandas_udf(StringType())
def remove_repeats(texts: pd.Series) -> pd.Series:
    """Text-only form of remove_repeats_ex for callers that don't need the
    fallback flag."""
    return texts.map(
        lambda t: None if t is None else remove_long_repeated_substrings(t)
    )


@F.pandas_udf(LANG_SCHEMA)
def lang_id(texts: pd.Series) -> pd.DataFrame:
    """Deterministic language ID behind the fastText-shaped gate
    (tool.py:16-35; sandbox fallback classifier, functions/langid.py)."""
    rows = [
        {"lang_pred": "", "lang_conf": 0.0, "is_zh": False}
        if t is None
        else dict(zip(("lang_pred", "lang_conf", "is_zh"), _langid.identify(t)))
        for t in texts
    ]
    return pd.DataFrame(rows, columns=["lang_pred", "lang_conf", "is_zh"])


def is_zh_relational(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 10,
    threshold: float = 0.7,
) -> DataFrame:
    """Relational twin of functions/langid.identify — the J1 offset-membership
    boolean (subsample_warc_warc.py:46-87 collapsed to a column) as pure SQL,
    DuckDB-expressible for the driver gate. Returns
    (doc_id, lang, conf, is_zh) with EXACTLY identify()'s decision arithmetic:
    short/empty -> ('', 0.0, false); zh score = CJK-char ratio of the cleaned
    text; stopword argmax (alphabetical-first tie-break, strict >) with
    conf = min(1, 4*score); zh wins ties (>=).

    Float determinism note (plans/oracles.py doctrine): both engines compute
    the same left-assoc double divisions/multiplications, so the >= / >
    comparisons and the 0.7 threshold agree bit-for-bit."""
    from ..functions.langid import LANGS, STOPWORDS
    from ..functions.spam import PY_WS_CLASS

    raw = F.col(text_col)
    # clean_text (tool.py:8-14): \s+ -> ' ' (Python-re \s set), control strip
    ctrl = CTRL_CLASS_PORTABLE
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(raw, F.lit(PY_WS_CLASS + "+"), F.lit(" ")),
            F.lit(ctrl),
            F.lit(""),
        )
    )
    d = docs.select(
        F.col(id_col), raw.alias("__raw__"), cleaned.alias("__cleaned__")
    )
    hit_exprs = {
        lang: F.expr(
            "size(filter(split(lower(__cleaned__), ' '), "
            f"t -> t in ({', '.join(repr(w) for w in STOPWORDS[lang])})))"
        )
        for lang in LANGS
    }
    d = d.select(
        id_col,
        "__raw__",
        "__cleaned__",
        *[hit_exprs[lang].alias(f"__hits_{lang}__") for lang in LANGS],
    )
    n = F.length(F.col("__cleaned__"))
    cjk = n - F.length(
        F.regexp_replace(
            F.col("__cleaned__"), F.lit(CJK_CLASS_PORTABLE), F.lit("")
        )
    )
    zh_score = cjk.cast("double") / n.cast("double")
    n_tok = F.size(F.split(F.lower(F.col("__cleaned__")), " "))
    scores = {
        lang: F.col(f"__hits_{lang}__").cast("double") / n_tok.cast("double")
        for lang in LANGS
    }
    best_score = F.greatest(*[scores[lang] for lang in LANGS])
    best_lang = F.lit("und")
    for lang in reversed(LANGS):  # build reversed so earliest lang wins ties
        best_lang = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(
            best_lang
        )
    lang_col = (
        F.when((zh_score >= best_score) & (zh_score > 0.0), F.lit("zh"))
        .when(best_score > 0.0, best_lang)
        .otherwise(F.lit("und"))
    )
    conf_col = (
        F.when((zh_score >= best_score) & (zh_score > 0.0), zh_score)
        .when(best_score > 0.0, F.least(F.lit(1.0), best_score * F.lit(4.0)))
        .otherwise(F.lit(0.0))
    )
    gated = (
        F.col("__raw__").isNull()
        | (F.length("__raw__") < F.lit(min_chars))
        | (F.length("__cleaned__") == 0)
    )
    return d.select(
        id_col,
        F.when(gated, F.lit("")).otherwise(lang_col).alias("lang"),
        F.when(gated, F.lit(0.0)).otherwise(conf_col).alias("conf"),
        F.when(
            gated, F.lit(False)
        ).otherwise(
            (lang_col == "zh") & (conf_col >= F.lit(threshold))
        ).alias("is_zh"),
    )


EXTRACT_FULL_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("fell_back", BooleanType()),
        StructField("lang_pred", StringType()),
        StructField("lang_conf", DoubleType()),
        StructField("is_zh", BooleanType()),
    ]
)


@F.pandas_udf(EXTRACT_FULL_SCHEMA)
def extract_full(html: pd.Series) -> pd.DataFrame:
    """Fused extraction kernel: html -> (text, fell_back, lang columns) in
    ONE JVM<->Python Arrow round trip. Composes exactly the three stage
    functions the separate UDFs run (extract_html_text ->
    remove_long_repeated_substrings_ex -> langid.identify, with the same
    NULL conventions), so values are identical — but the document crosses
    the Python boundary once instead of twice (guide §4.1: each chained
    pandas UDF is its own ArrowEvalPython round trip; the intermediate
    extracted_text no longer travels JVM->Python a second time)."""
    rows = []
    for h in html:
        t = extract_html_text(h)
        if t is None:
            txt, fb = None, False
        else:
            txt, fb = remove_long_repeated_substrings_ex(t)
        if txt is None:
            lp, lc, zh = "", 0.0, False
        else:
            lp, lc, zh = _langid.identify(txt)
        rows.append(
            {
                "text": txt,
                "fell_back": fb,
                "lang_pred": lp,
                "lang_conf": lc,
                "is_zh": zh,
            }
        )
    return pd.DataFrame(
        rows, columns=["text", "fell_back", "lang_pred", "lang_conf", "is_zh"]
    )


def with_extraction(df: DataFrame, html_col: str = "html") -> DataFrame:
    """E3 rebuild: derive extracted/cleaned text + language columns from raw
    html; the WARC two-pass offset membership (subsample_warc_warc.py:46-87)
    collapses into the single boolean ``is_zh`` column (SURVEY.md J1).
    ``repeat_removal_fell_back`` surfaces P4's over-budget approximate path
    per doc (expected ~0 on real corpora; auditable at scale).

    Round 8: the three per-doc Python stages run as ONE fused pandas UDF
    (``extract_full``) — one ArrowEvalPython node instead of two chained
    ones, halving the Python boundary crossings; the standalone UDFs above
    remain for callers that need a single stage."""
    # temp struct columns use collision-proof names: withColumn silently
    # REPLACES an existing column, so a plain "r"/"l" would destroy user data
    # ... and the EXPANDED output names must not collide either:
    # select('*', struct.*) DUPLICATES same-named input columns (ambiguous
    # references downstream, review finding) — raise instead. The guard
    # covers EVERY emitted column, including the withColumn-assigned
    # extracted_text / repeat_removal_fell_back (ADVICE r7: withColumn
    # silently replaces same-named input columns too).
    out_names = {
        "lang_pred",
        "lang_conf",
        "is_zh",
        "extracted_text",
        "repeat_removal_fell_back",
    } & set(df.columns)
    if out_names:
        raise ValueError(
            f"with_extraction: input columns collide with the operator's "
            f"output names {sorted(out_names)} — rename or drop them first"
        )
    ecol = "__extract_struct"
    return (
        df.withColumn(ecol, extract_full(F.col(html_col)))
        .withColumn("extracted_text", F.col(f"{ecol}.text"))
        .withColumn("repeat_removal_fell_back", F.col(f"{ecol}.fell_back"))
        .withColumn("lang_pred", F.col(f"{ecol}.lang_pred"))
        .withColumn("lang_conf", F.col(f"{ecol}.lang_conf"))
        .withColumn("is_zh", F.col(f"{ecol}.is_zh"))
        .drop(ecol)
    )
