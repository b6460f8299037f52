"""Unicode normalization for web text: full-width folding + NFC.

Crawled Chinese text mixes full-width ASCII (ＡＢＣ１２３！ — the
U+FF01..U+FF5E block plus U+3000 ideographic space) with half-width,
and decomposed combining sequences (e + U+0301) with precomposed
(é) — so byte-level operators (exact dedup, shingles, regexes, the
DFA scrub) silently treat equal-looking strings as different.  This
module canonicalizes BOTH axes before such operators run:

* :func:`fold_width_col` — full-width → ASCII via one native
  ``translate()`` (whole-stage codegen, no UDF; the repo already folds
  full-width digits this way in functions/pii.py — this is the full
  FF01–FF5E block + U+3000).  This is exactly NFKC's mapping for that
  block, applied natively so the hot path stays JVM-side.
* :func:`nfc_col` — Unicode canonical composition (NFC) via a
  null-safe Arrow pandas UDF over ``unicodedata.normalize`` (Spark has
  no built-in normalizer).  NFC only composes/decomposes canonically —
  it never changes visible content, so it is safe as a default
  pipeline stage (unlike full NFKC, which also folds ℓ, ﬁ, ②…).
* :func:`normalize_text` — the composed operator: width-fold first
  (native), then NFC (one Arrow pass).  Zero shuffles, pure map.

Cross-engine oracle: DuckDB computes the identical result natively as
``nfc_normalize(translate(text, src, dst))`` — utf8proc's NFC and
Python's unicodedata implement the same Unicode canonical composition
(pinned by the gated query on decorated text with both axes present).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "FULLWIDTH_SRC",
    "FULLWIDTH_DST",
    "fold_width_col",
    "nfc_col",
    "normalize_text",
]

# U+FF01..U+FF5E map 1:1 onto U+0021..U+007E; U+3000 (ideographic
# space) onto ' '. Codepoint-for-codepoint, so one translate() does it.
FULLWIDTH_SRC = "".join(chr(c) for c in range(0xFF01, 0xFF5F)) + "　"
FULLWIDTH_DST = "".join(chr(c) for c in range(0x21, 0x7F)) + " "


def fold_width_col(col) -> Column:
    """Native full-width→ASCII fold (no UDF, codegen-friendly)."""
    return F.translate(col, FULLWIDTH_SRC, FULLWIDTH_DST)


def nfc_col(col, form: str = "NFC") -> Column:
    """Unicode normalization (default NFC) as a null-safe Arrow UDF."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    @F.pandas_udf("string")
    def _norm(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None if t is None else unicodedata.normalize(form, t)
        )

    return _norm(col)


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    fold_width: bool = True,
    form: str = "NFC",
) -> DataFrame:
    """Append ``out_col`` = NFC(width-folded text). NULL stays NULL.

    Scale shape: the width fold is a native translate inside codegen;
    NFC is one Arrow map pass — the plan has no Exchange, no join,
    nothing driver-side (plan-asserted in tests/test_unicode_norm.py).
    Run it FIRST in a curation pipeline so hashes/shingles/regexes all
    see canonical bytes.
    """
    c: Column = F.col(text_col)
    if fold_width:
        c = fold_width_col(c)
    return docs.withColumn(out_col, nfc_col(c, form))
