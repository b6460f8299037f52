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
)
from ..functions import langid as _langid

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


@F.pandas_udf(StringType())
def remove_repeats(texts: pd.Series) -> pd.Series:
    """suffix-automaton long-repeat removal (clear_redundancy.py:104-170).
    O(n) states per doc; confined to the extraction stage like the reference
    (convert_warc_to_htmls.py:42-45)."""
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


def with_extraction(df: DataFrame, html_col: str = "html") -> DataFrame:
    """E3 rebuild: derive extracted/cleaned text + language columns from raw
    html; the WARC two-pass offset membership (subsample_warc_warc.py:46-87)
    collapses into the single boolean ``is_zh`` column (SURVEY.md J1)."""
    return (
        df.withColumn("extracted_text", extract_text(F.col(html_col)))
        .withColumn("extracted_text", remove_repeats(F.col("extracted_text")))
        .select("*", lang_id(F.col("extracted_text")).alias("l"))
        .select("*", "l.*")
        .drop("l")
    )
