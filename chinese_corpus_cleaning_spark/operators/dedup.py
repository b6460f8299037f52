"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
connected components.

This is the Spark-first re-expression of the reference's embedding-cosine
near-dup detection (/root/reference/text_quality_filter/utils/clustering.py:
50-90 DBSCAN over a full similarity matrix; check_duplicate :169-185 —
O(n^2), driver-bound) as the hash-join pipeline mandated by BASELINE.json's
north_rule: shingle -> MinHash signature -> banded LSH keys -> equi-join on
band key (shuffle hash join, AQE-skew-splittable) -> similarity filter ->
connected components (iterative small-star/large-star joins) -> representative
election (min url/id per component).

All hashes bottom out in the md5-based ``h60`` (functions/hashing.py) so the
DuckDB oracle can verify signatures, band keys, candidate pairs and SimHash
values exactly.

Scale notes (10^12 docs):
  * Signature computation is map-side only (one pandas UDF pass).
  * The LSH self-join shuffles on band_key; hot keys (boilerplate-identical
    pages from one host) are exactly the skew the north_rule calls out —
    handled by (a) AQE skew-join splitting and (b) an optional salting
    pre-pass exposed as ``salt_hot_keys``.
  * Connected components uses alternating small-star/large-star joins with
    per-iteration localCheckpoint to truncate lineage; converges in
    O(log n) iterations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import DedupConfig
from ..functions.hashing import char_shingles, lsh_band_keys, minhash_signature

# ---------------------------------------------------------------- exact dedup


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5(text): keep_id = min(id) per group.
    Pure hash aggregation — partial (map-side) + final, no UDFs."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# ------------------------------------------------------------- minhash + LSH


def minhash_udf(num_hashes: int, shingle_k: int):
    @F.pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: minhash_signature(char_shingles(t or "", shingle_k), num_hashes)
        )

    return sig


def band_keys_udf(num_bands: int):
    @F.pandas_udf(ArrayType(LongType()))
    def bands(sigs: pd.Series) -> pd.Series:
        return sigs.map(lambda s: lsh_band_keys(list(s), num_bands))

    return bands


def with_minhash(
    docs: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append ``minhash: array<long>`` and ``band_keys: array<long>``."""
    return docs.select(
        F.col(id_col),
        minhash_udf(cfg.num_hashes, cfg.shingle_size)(F.col(text_col)).alias("minhash"),
    ).withColumn("band_keys", band_keys_udf(cfg.num_bands)(F.col("minhash")))


def lsh_candidate_pairs(signed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banded LSH: explode band keys, self-join on key, dedupe pairs.

    The join is a plain equi-join on ``band_key`` — Catalyst picks SMJ/SHJ and
    AQE splits skewed keys. Pair order normalized (a < b)."""
    exploded = signed.select(
        F.col(id_col).alias("id"), F.col("minhash"), F.explode("band_keys").alias("band_key")
    )
    left = exploded.alias("l")
    right = exploded.select("id", "band_key").alias("r")
    return (
        left.join(right, on="band_key")
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.minhash").alias("minhash_a"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_similarity_pairs(
    docs: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs with estimated Jaccard (fraction of agreeing minhash
    slots) >= cfg.similarity_threshold. Returns (id_a, id_b, est_jaccard)."""
    signed = with_minhash(docs, cfg, id_col, text_col)
    pairs = lsh_candidate_pairs(signed, id_col)
    sig_b = signed.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("minhash_b")
    )
    est = (
        pairs.join(sig_b, "id_b")
        .withColumn(
            "est_jaccard",
            F.expr(
                "size(filter(zip_with(minhash_a, minhash_b, (x, y) -> x = y),"
                " v -> v)) / size(minhash_a)"
            ),
        )
        .where(F.col("est_jaccard") >= F.lit(cfg.similarity_threshold))
        .select("id_a", "id_b", "est_jaccard")
    )
    return est


# ------------------------------------------------------- n-gram jaccard pairs


def shingle_explode(docs: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct char k-shingles per doc, relationally (native exprs only):
    (id, shingle). Short texts contribute the whole text as one shingle."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.when(
                F.length(text_col) < k, F.array(F.col(text_col))
            ).otherwise(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length({text_col}) - {k} + 1),"
                        f" i -> substring({text_col}, i, {k}))"
                    )
                )
            )
        ).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 5,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard via shingle equi-join (no UDFs):
    |A ∩ B| from the join, |A|,|B| from per-doc counts. Returns
    (id_a, id_b, jaccard). For bounded fan-out at scale, run on LSH
    candidates; this exact form is the oracle-checkable baseline."""
    sh = shingle_explode(docs, k, id_col, text_col)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "n_b"), "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------- simhash


def simhash_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash over whitespace tokens, fully relational (no UDF):
    explode tokens -> h60 -> explode 60 bit positions -> sign-sum -> pack.

    At scale the bit-explode multiplies rows x60; for the production path use
    the pandas-UDF variant (simhash_udf) — this relational form is the
    oracle-checkable specification of the same value."""
    tokens = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn(
        "h", F.expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)")
    )
    bits = tokens.select(
        "id",
        F.explode(F.expr("sequence(0, 59)")).alias("bit"),
        F.col("h"),
    ).withColumn(
        "contrib", F.when(F.expr("shiftright(h, bit) % 2 = 1"), 1).otherwise(-1)
    )
    return (
        bits.groupBy("id", "bit")
        .agg(F.sum("contrib").alias("s"))
        .withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(F.lit(0)),
        )
        .groupBy("id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def simhash_udf():
    from ..functions.hashing import simhash60

    @F.pandas_udf(LongType())
    def sh(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: simhash60((t or "").split(" ")))

    return sh


# -------------------------------------------------- connected components (CC)


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected edge list (id_a, id_b) ->
    (id, component) with component = min id reachable.

    Iterative min-label propagation as DataFrame joins; each iteration
    localCheckpoints to truncate lineage (SURVEY.md §4 item 4). Converges in
    <= O(log n) iterations on duplicate-family graphs (small diameter)."""
    # symmetric neighbor list
    sym = edges.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nbr")
    ).union(edges.select(F.col("id_b").alias("id"), F.col("id_a").alias("nbr")))
    labels = sym.groupBy("id").agg(
        F.least(F.min("nbr"), F.col("id")).alias("comp")
    )
    for _ in range(max_iter):
        # propagate each node's label to neighbors; take the min seen
        prop = (
            sym.join(labels, "id")
            .groupBy(F.col("nbr").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(prop, "id", "left")
            .withColumn("new_comp", F.least("comp", F.coalesce("nbr_comp", "comp")))
            .select("id", F.col("new_comp").alias("comp"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_representatives(
    docs: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full near-dup stage: (id, component, is_duplicate). Representative =
    min id per component (clustering.py:169-207 semantics re-expressed:
    dup iff similar to an earlier doc; J3 cluster score derivable from
    component size)."""
    pairs = minhash_similarity_pairs(docs, cfg, id_col, text_col)
    comp = connected_components(pairs)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .withColumn("component", F.coalesce("comp", "id"))
        .withColumn("is_duplicate", F.col("id") != F.col("component"))
        .select("id", "component", "is_duplicate")
    )


# -------------------------------------------------------------- skew salting


def salt_hot_keys(df: DataFrame, key_col: str, threshold: int, salt_buckets: int) -> DataFrame:
    """Skew pre-pass (SURVEY.md §4 item 2): keys whose frequency exceeds
    ``threshold`` get a salted key ``key#<pmod(xxhash64(rand_src), S)>`` so one
    hot boilerplate page family spreads over S reducers; cold keys keep key#0.
    The hot-key table is tiny -> broadcast join."""
    hot = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > threshold)
        .select(key_col)
        .withColumn("is_hot", F.lit(True))
    )
    return (
        df.join(F.broadcast(hot), key_col, "left")
        .withColumn(
            "salted_key",
            F.when(
                F.col("is_hot").isNotNull(),
                F.concat_ws(
                    "#",
                    F.col(key_col).cast("string"),
                    F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("string"),
                ),
            ).otherwise(F.concat(F.col(key_col).cast("string"), F.lit("#0"))),
        )
        .drop("is_hot")
    )
