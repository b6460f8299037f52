"""Distributed n-gram LM training + perplexity scoring.

Training (SURVEY.md §2.7 A2): explode (context, word) n-grams relationally ->
groupBy(context, word).count() — Spark's partial+final hash aggregation does
the heavy lifting; the model table is tiny relative to the corpus.

Scoring, two interchangeable paths:
  * relational: explode the document's n-grams, broadcast-join the counts
    table, Lidstone-smooth, agg log2 probs per doc — fully oracle-checkable
    and shuffle-light (model side broadcast).
  * broadcast-UDF (scale fast path): ship {(context,word)->cnt, context->tot,
    |V|} via broadcast and score inside one pandas UDF pass (no join at all).

Both reproduce the arithmetic of the reference's recovered NgramModel
(SURVEY.md §2.9): P = (c+α)/(C+α|V|), ppl = 2^(−mean log2 P), log floor −100.

Tokenization: BOTH paths are whitespace-delimited (the relational path
splits natively, the UDF path splits with ``t.split(' ')`` so its lookups
hit the same keys the relational trainer wrote). For raw Chinese text,
pre-tokenize with functions/ngram_lm.tokenize (jieba when available,
CJK-per-char fallback) and space-join BEFORE training/scoring — the CLI
'train' path (api.train_models) does exactly this; feeding unsegmented
text directly makes every document one giant token and scores everything
at the smoothing floor.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..functions.ngram_lm import BOS, EOS, LOG_FLOOR, NgramModel, perplexity_score

_SEP = "\x1f"  # context-token joiner inside the flat model table


def _padded_tokens_expr(text_col: str, n: int) -> str:
    """Native expr for the padded whitespace token array
    (<s>*(n-1) ++ split(text) ++ <\\s> — ngram_lm.ngrams semantics)."""
    pads = ", ".join([f"'{BOS}'"] * (n - 1))
    return (
        f"concat(array({pads}), split({text_col}, ' '), array('{EOS}'))"
        if n > 1
        else f"concat(split({text_col}, ' '), array('{EOS}'))"
    )


def _ngrams_over_tokens_expr(toks_col: str, n: int) -> str:
    """array<struct<context:string, word:string>> over an ALREADY-MATERIALIZED
    padded token array column.

    ``toks_col`` MUST be a plain column reference, never the padding
    expression spliced inline: transform/slice/element_at are interpreted
    (CodegenFallback), and an inline sub-expression inside the lambda body
    is re-evaluated PER ELEMENT — the concat+split would run once per
    n-gram, making the explode O(tokens^2) per document (measured 8x on the
    sf0.1 trigram explode, round-8 notes). Against a column reference the
    array is built once per row and each lambda step is O(n)."""
    return (
        f"transform(sequence({n}, size({toks_col})), "
        f"i -> struct(array_join(slice({toks_col}, i - {n - 1}, {n - 1}), '{_SEP}') as context, "
        f"element_at({toks_col}, i) as word))"
    )


def _ngram_expr(text_col: str, n: int) -> str:
    """One-expression form (kept for external callers); prefer projecting
    ``_padded_tokens_expr`` to a column first — see _ngrams_over_tokens_expr
    for why the inline splice is quadratic."""
    toks = _padded_tokens_expr(text_col, n)
    return (
        f"transform(sequence({n}, size({toks})), "
        f"i -> struct(array_join(slice({toks}, i - {n - 1}, {n - 1}), '{_SEP}') as context, "
        f"element_at({toks}, i) as word))"
    )


def ngram_counts(
    docs: DataFrame, n: int = 3, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Model table: (context, word, cnt). Pure native explode + hash agg.

    ``min_count`` > 1 prunes rare n-grams AFTER aggregation (a HAVING, so the
    counts themselves are exact). This is the scale lever for 10^12-doc
    corpora: the raw trigram table of a web crawl is dominated by singletons
    (typically >70%); min_count=2 shrinks the model several-fold so it stays
    broadcastable far longer, and beyond that the scorer switches to the
    shuffle join (perplexity_relational(broadcast_model=False)). Downstream
    smoothing treats pruned pairs as unseen — the standard count-cutoff LM
    approximation."""
    from .partitioning import ensure_min_parallelism

    counts = (
        ensure_min_parallelism(docs)
        .select(F.expr(_padded_tokens_expr(text_col, n)).alias("__toks"))
        .select(F.explode(F.expr(_ngrams_over_tokens_expr("__toks", n))).alias("g"))
        .select("g.context", "g.word")
        .groupBy("context", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        counts = counts.where(F.col("cnt") >= F.lit(min_count))
    return counts


def vocab_size(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).agg(F.countDistinct("tok").alias("v"))


def perplexity_relational(
    docs: DataFrame,
    model: DataFrame,
    n: int = 3,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    v: int | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """(doc_id, ppl): explode doc n-grams, join model counts, smooth,
    aggregate. ``v`` = vocab size; when None it stays IN the plan as a
    broadcast one-row cross join (no driver round trip — the whole scorer
    remains a single lazy composable plan).

    ``broadcast_model``: True hints broadcast joins (the model fits executor
    memory — the common case, map-side and shuffle-free on the corpus side).
    False leaves the join strategy to Catalyst with no hint — for models too
    big to broadcast (10^12-doc corpora even after min_count pruning) this
    becomes a shuffle hash/sort-merge join on (context, word); the corpus
    side shuffles once on the n-gram key. Cutover doctrine mirrors
    connected_components': pick the physical strategy by data size."""
    ctx_tot = model.groupBy("context").agg(F.sum("cnt").alias("ctx_cnt"))
    if broadcast_model:
        model = F.broadcast(model)
        ctx_tot = F.broadcast(ctx_tot)
    from .partitioning import ensure_min_parallelism

    grams = (
        ensure_min_parallelism(docs)
        .select(
            F.col(id_col),
            F.expr(_padded_tokens_expr(text_col, n)).alias("__toks"),
        )
        .select(
            F.col(id_col),
            F.explode(F.expr(_ngrams_over_tokens_expr("__toks", n))).alias("g"),
        )
        .select(id_col, "g.context", "g.word")
    )
    joined = grams.join(model, ["context", "word"], "left").join(
        ctx_tot, ["context"], "left"
    )
    if v is None:
        joined = joined.crossJoin(F.broadcast(vocab_size(docs, text_col)))
        v_col = F.col("v")
    else:
        v_col = F.lit(v)
    joined = joined.withColumn(
        "log2p",
        F.log2(
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
            / (F.coalesce(F.col("ctx_cnt"), F.lit(0)) + F.lit(alpha) * v_col)
        ),
    ).withColumn("log2p", F.greatest(F.col("log2p"), F.lit(LOG_FLOOR)))
    return joined.groupBy(id_col).agg(
        F.pow(F.lit(2.0), -F.avg("log2p")).alias("ppl"),
        (-F.avg("log2p")).alias("neg_avg_log2p"),
    )


def train_broadcast_model(
    spark, docs: DataFrame, n: int = 3, alpha: float = 0.1, text_col: str = "text"
):
    """Distributed training -> compact driver model -> broadcast handle for
    the UDF fast path. The collected model is the aggregated counts table
    (small: unique n-grams), NOT the corpus.

    Collection rides Arrow both ways (``toPandas`` columnar collect, dicts
    built from the columnar arrays) — the same shape that cut the dedup
    driver-CC collect 5.7x (operators/dedup._cc_driver); Row-object
    ``collect()`` deserializes one Python object per cell and is the known
    driver-side scaling cap (CLAUDE.md)."""
    pdf = ngram_counts(docs, n, text_col).toPandas()
    v = int(vocab_size(docs, text_col).toPandas()["v"].iloc[0])
    # flat "context\x1fword" string keys: one dict probe per n-gram when
    # scoring (vs tuple construction + tuple hash), and pandas .map-able
    keys = (pdf["context"] + _SEP + pdf["word"]).to_list()
    pair_counts = dict(zip(keys, pdf["cnt"].to_list()))
    ctx_tot = pdf.groupby("context", sort=False)["cnt"].sum().to_dict()
    return spark.sparkContext.broadcast(
        {"n": n, "alpha": alpha, "v": v, "pairs": pair_counts, "ctx": ctx_tot}
    )


def perplexity_udf(model_bc):
    """Zero-join broadcast scorer: the model rides a SparkContext broadcast,
    so the corpus side never shuffles at all. Whitespace tokens to match the
    relational trainer. Semantics identical to the relational scorer:
    P=(c+α)/(C+α|V|), log2 floor only when P underflows to 0,
    ppl=2^(−mean log2 P), empty-token docs -> +inf, null text -> null
    (parity-tested in tests/test_perplexity_scale.py).

    Implementation note (measured, BENCH/ppl_udf_bench.py): a fully
    numpy-vectorized variant (flat key lists -> two Series.map(dict) passes
    -> np.log2 + add.reduceat) was benchmarked at 0.5-0.9x of this plain
    per-doc loop on 20k-200k docs — key construction and tokenization
    dominate, and the vector form just adds three corpus-sized intermediate
    materializations. The loop stays. The flat "ctx\\x1fword" string keys
    (vs tuples) and the Arrow-collected model ARE measured wins and are
    kept. The RELATIONAL scorer (perplexity_relational, broadcast hint) is
    the production 100 TB path; this UDF is the no-shuffle alternative for
    models too irregular to join."""
    import math

    @F.pandas_udf(DoubleType())
    def ppl(texts: pd.Series) -> pd.Series:
        m = model_bc.value
        n, alpha, v = m["n"], m["alpha"], m["v"]
        pairs, ctx_tot = m["pairs"], m["ctx"]
        av = alpha * v

        def one(t):
            if t is None:
                return None
            toks = [BOS] * (n - 1) + t.split(" ") + [EOS]
            total, cnt = 0.0, 0
            for i in range(n - 1, len(toks)):
                ctx = _SEP.join(toks[i - (n - 1) : i])
                num = pairs.get(ctx + _SEP + toks[i], 0) + alpha
                den = ctx_tot.get(ctx, 0) + av
                p = num / den if den > 0 else 0.0
                total += math.log2(p) if p > 0 else LOG_FLOOR
                cnt += 1
            return 2.0 ** (-total / cnt) if cnt else float("inf")

        return texts.map(one)

    return ppl


def ppl_buckets(
    docs: DataFrame,
    model: DataFrame | None = None,
    n: int = 3,
    alpha: float = 0.1,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """CCNet-style head/middle/tail corpus partitioning by per-language LM
    perplexity tertiles (Wenzek et al. 2020: score each document with an
    n-gram LM, split each language's corpus at the 1/3 and 2/3 perplexity
    cutoffs; "head" = most fluent third). The reference's banded ppl score
    (§2.9, lmppl_perplexity.py) keeps/drops per-doc; this adds the standard
    corpus-level partitioning a training-data pipeline samples from.

    Cutoff arithmetic is deliberately INTEGER-EXACT, not quantile
    interpolation: perplexities are rounded to 2 dp (the repo's published
    ppl precision), histogrammed per group, and the cutoff is the smallest
    rounded ppl whose cumulative count reaches j/3 of the group
    (``3*cum >= j*n`` on bigint counts — no float quantile formula whose
    last-bit rounding could flip a boundary doc between engines). Docs in
    the cutoff bin all land on the lower side, exactly like CCNet's
    histogram-bin cutoffs.

    Scale shape (100 TB): the corpus-sized stages are the ppl scorer
    (perplexity_relational — broadcast-model map-side join, or shuffle join
    when the model outgrows broadcast), one slim (id, group) join to attach
    the group key, and one hash aggregation to the (group, rounded-ppl)
    histogram — map-side partials bound its shuffle by the number of
    distinct bins, not docs. The cumulative window runs over the histogram
    only (|groups| x |bins| rows), and the three-row-per-group cutoff table
    broadcasts back. Nothing sorts or windows over per-document data.
    The scored table feeds BOTH the histogram branch and the labeled
    output, so it is materialized once (eager localCheckpoint — the same
    scored-twice doctrine as dedup_incremental's corpus index); without it
    the LM scoring pass, the most expensive stage, would re-execute per
    consumer.

    Returns (id, group, ppl [2 dp], neg_avg_log2p, ppl_bucket, t_head,
    t_middle); docs whose text yields no n-grams (NULL text) are absent,
    matching perplexity_relational. A NULL group is a group of its own
    (groupBy keeps NULL keys and the cutoff join is null-safe), so docs
    with a failed language ID still get buckets instead of vanishing.
    """
    from pyspark.sql import Window

    if model is None:
        model = ngram_counts(docs, n, text_col)
    scored = perplexity_relational(
        docs, model, n=n, alpha=alpha, id_col=id_col, text_col=text_col,
        broadcast_model=broadcast_model,
    ).withColumn("ppl", F.round("ppl", 2))
    scored = scored.join(docs.select(id_col, group_col), id_col)
    scored = scored.localCheckpoint(eager=True)
    hist = scored.groupBy(group_col, "ppl").agg(F.count(F.lit(1)).alias("c"))
    # histogram bins are distinct per group, so ROWS == RANGE here; the
    # explicit ROWS frame keeps both engines' default-frame semantics out
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("ppl")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "ntot", F.sum("c").over(Window.partitionBy(group_col))
    )
    cutoffs = cum.groupBy(group_col).agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("ntot"), F.col("ppl"))
        ).alias("t_head"),
        F.min(
            F.when(F.col("cum") * 3 >= F.col("ntot") * 2, F.col("ppl"))
        ).alias("t_middle"),
    ).withColumnRenamed(group_col, "__g")
    return scored.join(
        F.broadcast(cutoffs), F.col(group_col).eqNullSafe(F.col("__g"))
    ).withColumn(
        "ppl_bucket",
        F.when(F.col("ppl") <= F.col("t_head"), F.lit("head"))
        .when(F.col("ppl") <= F.col("t_middle"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).select(
        id_col, group_col, "ppl", "neg_avg_log2p", "ppl_bucket",
        "t_head", "t_middle",
    )


def ppl_score_col(ppl_col: str, threshold: float = 500.0, max_ppl: float = 10000.0):
    """Native Column for the banded perplexity score (SURVEY.md §2.9)."""
    capped = F.least(F.col(ppl_col), F.lit(max_ppl))
    half = threshold / 2
    return (
        F.when(capped >= max_ppl, F.lit(0.0))
        .when(capped <= half, F.lit(1.0))
        .otherwise(
            F.greatest(
                F.lit(0.0), F.lit(1.0) - (capped - F.lit(half)) / F.lit(max_ppl - half)
            )
        )
    )


def score_with_python_model(texts: list[str], n: int = 3) -> list[float]:
    """Test helper: the pure-Python twin of the relational scorer (whitespace
    tokens) for golden comparisons."""
    m = NgramModel(n=n)
    # emulate whitespace tokenization regardless of jieba availability
    for t in texts:
        toks = t.split(" ")
        m.vocab.update(toks)
        from ..functions.ngram_lm import ngrams

        for ctx, w in ngrams(toks, n):
            m.counts.setdefault(ctx, __import__("collections").Counter())[w] += 1
    out = []
    import math

    for t in texts:
        from ..functions.ngram_lm import ngrams

        grams = ngrams(t.split(" "), n)
        tot = 0.0
        for ctx, w in grams:
            p = m.prob(ctx, w)
            tot += math.log2(p) if p > 0 else LOG_FLOOR
        out.append(2.0 ** (-tot / len(grams)) if grams else float("inf"))
    return out
