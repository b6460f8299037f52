"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

The last stage of a corpus pipeline the reference family never had: learn
the merge table FOR this corpus, on the cluster that already holds it.
Classic BPE is inherently iterative (each merge changes the pair counts),
so the Spark shape follows the repo's iterative doctrine (kmeans_fit /
train_logreg / connected components):

1.  ``bpe_vocab`` — ONE corpus pass: pre-tokenize (portable whitespace
    class), aggregate to the (token, freq) vocabulary. This is the
    Sennrich formulation: all further work runs on the vocabulary table
    (|vocab| << corpus — the 100 TB input collapses to the distinct-token
    table before any iteration starts), weighted by freq.
2.  per merge iteration:
      a. adjacent-pair counts: map-side explode of (sym[i], sym[i+1])
         guarded against the sequence() descent landmine, weighted by
         freq, partial-aggregated into one slim (left, right, cnt)
         shuffle;
      b. argmax via orderBy+limit(1) => TakeOrderedAndProject (per-
         partition top-1 + driver merge — no global sort), tie-break
         (cnt desc, left asc, right asc) so training is deterministic;
      c. the merge applies map-side as a left-to-right non-overlapping
         fold over each symbol array (F.aggregate with a struct
         accumulator and the pair bound as literal Columns — no SQL
         string splicing, so symbols containing quotes/regex
         metacharacters are safe), touching ONLY the rows whose symbols
         contain the pair (cheap native filter; untouched rows pass
         through by union);
      d. the vocabulary is localCheckpointed each iteration (loop-state
         doctrine: without it iteration k re-executes all k-1 prior merge
         lambdas over the original table).

Differential-tested against a driver-side reference BPE with identical
tie-breaks; the single-iteration pair-count kernel is the gated
SQL-expressible query (``bpe_pair_counts``) — the loop itself is not
SQL-expressible (per-iteration argmax feeds the next iteration's
expression), the documented weaker-check category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_vocab", "bpe_pair_counts", "bpe_apply_merge", "bpe_train"]

# explicit ASCII whitespace class: Java regex and RE2 disagree on \s's
# edges (CLAUDE.md portable-regex rule), so both engines get this literal
WS_CLASS = "[ \\t\\n\\r]+"


def bpe_vocab(
    docs: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
) -> DataFrame:
    """(token, freq, symbols): the whitespace-token vocabulary with each
    token pre-split into single-codepoint symbols (substring transform —
    codepoint-indexed identically in Spark and DuckDB). The one
    corpus-sized pass; everything after runs on this table."""
    toks = (
        docs.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), WS_CLASS)
            ).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        toks = toks.where(F.col("freq") >= min_freq)
    return toks.withColumn(
        "symbols",
        F.expr(
            "transform(sequence(1, length(token)), i -> substring(token, i, 1))"
        ),
    )


def bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, cnt): freq-weighted adjacent symbol-pair counts over
    the vocabulary — one merge iteration's statistics. The explode is
    map-side (guarded: single-symbol tokens contribute no pairs — the
    sequence(n, size) descent landmine arm); the shuffle carries only the
    partially-aggregated slim pair rows."""
    pairs = F.expr(
        "case when size(symbols) < 2 then"
        " cast(array() as array<struct<l: string, r: string>>)"
        " else transform(sequence(1, size(symbols) - 1),"
        " i -> struct(symbols[i - 1] as l, symbols[i] as r)) end"
    )
    return (
        vocab.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every symbols array, merging adjacent (a, b) -> a+b
    left-to-right non-overlapping (the BPE scan rule: 'aaaa' under (a,a)
    becomes ['aa','aa'], 'aaa' becomes ['aa','a']). Pure map-side fold;
    rows whose symbols cannot contain the pair are filtered past the
    lambda untouched."""
    merged = F.lit(a + b)
    la, lb = F.lit(a), F.lit(b)

    def step(acc, s):
        return (
            F.when(
                acc["prev"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("prev")),
            )
            .when(
                (acc["prev"] == la) & (s == lb),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                    s.alias("prev"),
                )
            )
        )

    fold = F.aggregate(
        F.col("symbols"),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("prev"),
        ),
        step,
        lambda acc: F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        ),
    )
    touchable = (F.array_position(F.col("symbols"), la) > 0) & (
        F.array_position(F.col("symbols"), lb) > 0
    )
    return vocab.withColumn(
        "symbols", F.when(touchable, fold).otherwise(F.col("symbols"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 1,
    min_pair_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge table [(left, right, count_at_merge_time), ...] — the artifact
    a tokenizer consumes. Stops early when no pair reaches
    ``min_pair_freq`` (merging hapax pairs memorizes noise).

    Deterministic: tie-break (cnt desc, left asc, right asc); the
    vocabulary aggregate is partition-independent; each iteration's state
    is localCheckpointed (loop doctrine)."""
    vocab = bpe_vocab(docs, text_col, min_freq).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        top = (
            bpe_pair_counts(vocab)
            .orderBy(
                F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_freq:
            break
        a, b, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = bpe_apply_merge(vocab, a, b).localCheckpoint(eager=True)
    return merges
