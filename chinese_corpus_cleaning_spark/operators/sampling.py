"""Deterministic stratified sampling — training-mix curation.

A training-data pipeline rarely consumes a cleaned corpus whole: the mix is
curated per stratum (source x language, quality band, domain), with a quota
per cell. Spark's `sampleBy` gives *Bernoulli* fractions — nondeterministic
row counts, seed-and-partitioning dependent. This operator gives the other
contract curation needs: an EXACT per-stratum quota, fully deterministic
(same corpus -> same sample, independent of partitioning, retries, or
cluster size), because the "random" order is a content hash (md5-derived
h60 of the document id — the repo's proven cross-engine primitive,
operators/dedup._h60_sql) rather than an RNG stream.

Scale shape (the reason this is not one `Window.partitionBy(stratum)`):
a plain per-stratum window ships EVERY row of a stratum to one task — a
hot stratum (one language dominating a crawl) becomes a single-reducer
straggler at 100 TB. Two phases instead:

  1. local top-k per (stratum, salt): salt = pmod(xxhash64(id), B) is
     content-derived (deterministic under retries, CLAUDE.md doctrine);
     each first-phase group is ~1/B of the hottest stratum, and its output
     is bounded at k rows.
  2. global top-k per stratum over the <= B*k surviving rows per stratum —
     trivially small regardless of corpus size.

min-k of a total order is associative, so the two-phase sample SET is
identical to the naive single-window form (test-asserted, and invariant to
``salt_buckets``). Ties cannot occur: the order key is (h60(id), id) and
id is unique per row.

The reference has no sampling stage (its segment sampler, clear_quality.py,
samples WITHIN a document for perplexity — P7, functions/cleaning.py);
this is corpus-level curation beyond the reference, per the build brief.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _h60_sql

__all__ = ["stratified_sample", "pack_sequences", "token_count_sql"]


# U+4E00..U+9FFF (CJK Unified Ideographs) with LITERAL endpoint characters:
# Java regex and RE2 agree on literal codepoint ranges in classes, while the
# \uXXXX / \x{...} spellings are dialect-split (CLAUDE.md portable-regex
# rule; same device as textanalysis.C4_TERMINAL_RE).
_CJK_CLASS = "[一-鿿]"


def token_count_sql(text_col: str, mode: str = "cjk") -> str:
    """Portable (Spark SQL) token-count expression over ``text_col``.

    ``mode='cjk'`` (the default the packing/export path needs): each CJK
    Unified Ideograph counts as one token, and the non-CJK residue is
    counted in whitespace words (CJK chars are replaced by a space first,
    so ``abc中def`` is 1 + 2, not 1 + 1). Unsegmented Chinese text is ~1
    whitespace token per LINE — a "2048-token" shard packed by whitespace
    count would carry hundreds of thousands of Chinese characters; the
    reference itself tokenizes Chinese (jieba) for its LM (SURVEY §2.9), so
    chars-for-CJK + words-elsewhere is the reference-consistent budget unit
    (≈ jieba token count within a small constant factor, with zero
    segmenter dependency). Match counting (``regexp_count``) is used
    instead of length arithmetic so the DuckDB oracle twin
    (len(regexp_extract_all(...))) agrees per-codepoint regardless of the
    engines' grapheme-vs-codepoint length() semantics.

    ``mode='whitespace'``: the original ``size(split(text, ' '))`` count
    (token_stats semantics — NULL behaves as '', which is ONE empty
    token). Kept for parity with pre-round-7 shard layouts.
    """
    t = f"coalesce({text_col}, '')"
    if mode == "whitespace":
        return f"size(split({t}, ' '))"
    if mode != "cjk":
        raise ValueError(f"unknown token count mode: {mode!r}")
    resid = f"trim(regexp_replace({t}, '{_CJK_CLASS}', ' '))"
    return (
        f"regexp_count({t}, '{_CJK_CLASS}') + "
        f"(case when {resid} = '' then 0 "
        f"else size(split({resid}, ' +')) end)"
    )


def stratified_sample(
    docs: DataFrame,
    stratum_cols: Sequence[str] = ("source", "lang"),
    k: int = 3,
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically.

    Returns the input columns plus ``sample_rank`` (1..k within each
    stratum, dense from 1, in h60-of-id order). Rank 1 of each stratum is
    a stable "representative document" for inspection dashboards; taking
    ``sample_rank <= j`` for any j <= k is itself a valid smaller quota
    sample (prefix-stability — an RNG-based sampler does not have this).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    strata = [F.col(c) for c in stratum_cols]
    h = F.expr(_h60_sql(f"cast({id_col} as string)"))
    base = (
        docs.withColumn("__h", h)
        .withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        )
    )
    w_local = Window.partitionBy(*strata, F.col("__salt")).orderBy(
        F.col("__h"), F.col(id_col)
    )
    survivors = (
        base.withColumn("__r", F.row_number().over(w_local))
        .where(F.col("__r") <= k)
        .drop("__r", "__salt")
    )
    w_global = Window.partitionBy(*strata).orderBy(F.col("__h"), F.col(id_col))
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w_global))
        .where(F.col("sample_rank") <= k)
        .drop("__h")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
    token_count: str = "cjk",
    token_count_expr: str | None = None,
) -> DataFrame:
    """Sequence packing / token-budget sharding — the export-stage operator
    of an LLM training pipeline (GPT/Megatron-style packing: concatenate
    documents in a deterministic pseudo-random order and split the token
    stream into fixed-``budget`` training shards). Every doc gets its shard
    span and start offset from the GLOBAL cumulative token count over the
    (h60(id), id) order.

    Deterministic and partitioning/retry-independent: the order key is a
    content hash, never an RNG or zipWithIndex (whose assignment depends on
    physical partitioning); all arithmetic is bigint — no float anywhere.

    Scale shape (same design language as stratified_sample): a naive global
    window would range-partition and fully sort the corpus. Instead the h60
    key is pre-bucketed by its TOP bits (``b = h >> (60 - log2 n_buckets)``
    — bucket boundaries are compile-time constants, and bucket order equals
    h order, so concatenating buckets reproduces the global order), the
    within-bucket cumulative sum windows over (b)-partitions of slim
    (id, h, n_tokens) rows, and the per-bucket totals (``n_buckets`` rows)
    prefix-cumulate in one tiny window and broadcast back as offsets. One
    bounded hash exchange on b — no rangepartitioning, no global sort, and
    the text column never leaves the map side.

    Returns (id, n_tokens, cum_tokens, shard_first, shard_last,
    offset_in_shard): the doc's tokens occupy shards
    [shard_first, shard_last] of width ``budget`` (a doc MAY straddle
    shards — standard packing splits at sequence boundaries), starting at
    ``offset_in_shard`` inside shard_first.

    n_tokens defaults to the CJK-aware count (``token_count_sql('cjk')``:
    one token per CJK ideograph + whitespace words over the residue) —
    the budget unit that is actually meaningful for the Chinese corpus
    this engine targets. ``token_count='whitespace'`` restores the pre-
    round-7 whitespace split; ``token_count_expr`` accepts any bigint-
    valued SQL expression over the input columns (e.g. a precomputed
    tokenizer count column) and overrides ``token_count``.

    ``n_buckets`` (power of 2) caps the within-bucket window parallelism
    and sets corpus/n_buckets rows per cumsum task. Default None derives
    it from the input: the next power of two >= max(64, input partition
    count) — at 100 TB the scan parallelism (tens of thousands of file
    splits) carries through, while small inputs keep the 64-way floor.
    The value is a PHYSICAL knob only: any n_buckets yields identical
    output (test-asserted), so an explicit setting is always safe.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_buckets is None:
        target = max(64, docs.rdd.getNumPartitions())
        n_buckets = 1 << (target - 1).bit_length()
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of 2")
    shift = 60 - (n_buckets.bit_length() - 1)
    n_expr = token_count_expr or token_count_sql(text_col, token_count)
    slim = docs.select(
        F.col(id_col),
        F.expr(n_expr).cast("long").alias("n_tokens"),
        F.expr(_h60_sql(f"cast({id_col} as string)")).alias("__h"),
    ).withColumn("__b", F.shiftright(F.col("__h"), shift))
    w_in = (
        Window.partitionBy("__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = slim.withColumn("__wcum", F.sum("n_tokens").over(w_in))
    # n_buckets rows total: the single-partition window is deliberate
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        slim.groupBy("__b")
        .agg(F.sum("n_tokens").alias("__bt"))
        .withColumn("__off", F.coalesce(F.sum("__bt").over(w_off), F.lit(0)))
        .select("__b", "__off")
    )
    cum = F.col("__off") + F.col("__wcum")
    # div = bigint floor division (operands are non-negative by construction)
    return within.join(F.broadcast(offsets), "__b").select(
        id_col,
        "n_tokens",
        cum.alias("cum_tokens"),
        F.expr(f"(__off + __wcum - n_tokens) div {budget}").alias("shard_first"),
        F.expr(f"(__off + __wcum - 1) div {budget}").alias("shard_last"),
        ((cum - F.col("n_tokens")) % F.lit(budget)).alias("offset_in_shard"),
    )
