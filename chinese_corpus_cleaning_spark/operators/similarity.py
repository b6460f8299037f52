"""Similarity search over embedding columns (array<float>).

The reference's embedding path (/root/reference/embed.py:23-45 CLS vectors,
utils/embed.py:58-82 full similarity matrix) is driver-bound O(n^2) numpy.
Re-expressed for Spark:

  * ``cosine_topk``: brute-force exact top-k — a self-join with the small
    side broadcast; the dot product stays JVM-side via zip_with/aggregate
    (whole-stage codegen, no Python). The scale baseline: with a broadcast
    probe set this is a map-side O(n·|probe|) scan, shuffle-free.
  * ``rp_lsh_buckets``: random-hyperplane LSH — deterministic ±1 hyperplanes
    derived from the md5-based h60 (oracle-verifiable), giving an
    equi-joinable ``bucket`` key; ANN = top-k within bucket only. The scale
    path: candidate generation becomes a hash join on bucket, shrinking the
    pair space by ~2^n_planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60


# Every embedding fixture/gate in this engine is 64-dimensional; the unrolled
# fast path below is guarded on exactly this length and falls back to the
# general higher-order fold for anything else, so the constant is a physical
# optimization knob, not a semantic limit.
_UNROLL_DIM = 64


def _dot_hof(a: str, b: str) -> str:
    # sequential fold => deterministic summation order (oracle parity)
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _dot(a: str, b: str, dim: int = _UNROLL_DIM) -> str:
    """Dot product with an UNROLLED whole-stage-codegen fast path.

    Spark higher-order lambdas (aggregate/zip_with) are CodegenFallback —
    evaluated interpreted per element with closure allocation per row
    (CLAUDE.md landmine; measured 2.2x on the 200x2000 cosine pair scan,
    round-8 notes). When both arrays have exactly ``dim`` elements the
    unrolled sum ``(((0.0 + p1) + p2) + ...)`` is the SAME left-associated
    IEEE addition chain over the SAME float->double casts the fold performs
    — bit-identical output (pinned by tests/test_similarity_unroll.py) —
    but it compiles into whole-stage codegen. Any other shape (NULL array,
    ragged/truncated vector, future non-64-dim corpus) takes the original
    fold, so semantics are unchanged everywhere. element_at is ANSI-safe
    here because the size guard proves every index is in range."""
    hof = _dot_hof(a, b)
    if not dim:
        return hof
    terms = "".join(
        f" + (cast(element_at({a}, {i}) as double)"
        f" * cast(element_at({b}, {i}) as double))"
        for i in range(1, dim + 1)
    )
    return (
        f"(case when size({a}) = {dim} and size({b}) = {dim} "
        f"then (cast(0.0 as double){terms}) else {hof} end)"
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2 norm, NULL for zero vectors: every cosine here divides by
    (_na * _nb), and Spark 4's default ANSI mode turns a zero-norm
    embedding (failed embedder, empty doc) into a job-fatal
    DIVIDE_BY_ZERO. nullif makes cosine-vs-zero-vector NULL instead —
    NULL orders last under desc (drops out of top-k), compares false
    against any tau, and max() ignores it, so all downstream keep/rank
    logic degrades per-row instead of aborting (review finding; the
    DuckDB oracle fixtures are zero-free so parity is untouched)."""
    return df.withColumn(
        "_norm", F.expr(f"nullif(sqrt({_dot(vec_col, vec_col)}), 0.0)")
    )


def _bucketed_norm_frame(
    vectors: DataFrame,
    buckets: DataFrame,
    key: str,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Slim (id, key, vec, _norm) frame for a within-bucket self-join,
    localCheckpointed ONCE: both sides of the self-join read this frame,
    and without the checkpoint each side re-executes the full
    bucket-expression + interpreted higher-order norm lineage — doubling
    the corpus scan cost per call (dedup.py multi-branch doctrine;
    review finding). eager=False: materializes at first action, like the
    other lazy checkpoints in this repo.

    The vector side goes through the parallelism-recovery guard first
    (operators/partitioning.py): both the bucket expressions and the
    within-bucket cosine scans downstream inherit this frame's partition
    count, and a one-row-group embedding file would otherwise run them
    all on one core."""
    from .partitioning import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors)
    return (
        with_norm(vectors.join(buckets, id_col), vec_col)
        .select(id_col, key, vec_col, "_norm")
        .localCheckpoint(eager=False)
    )


def cosine_topk(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors: (vec_id, neighbor_id, cos_sim, rank).

    ``probes`` defaults to the full set (all-pairs); pass a small probe
    DataFrame for query-style search — it is broadcast, making the join
    map-side."""
    from .partitioning import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors)
    base = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    qry = with_norm(probes if probes is not None else vectors, vec_col).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na")
    )
    if probes is not None:
        qry = F.broadcast(qry)
    pairs = (
        qry.crossJoin(base)
        .where(F.col("qid") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.expr(_dot("_va", "_vb")) / (F.col("_na") * F.col("_nb")),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("vec_id"), "neighbor_id", "cos_sim", "rank"
        )
    )


def hyperplane_sign_expr(vec_col: str, plane: int, dim: int) -> str:
    """SQL expression for sign(dot(vec, H_plane)) where H_plane[d] = +1 if
    h60(f"{plane}|{d}") is odd else -1 — deterministic, dialect-portable.

    try_element_at, not element_at: under Spark 4's default ANSI mode a
    ragged/truncated embedding (fewer than ``dim`` elements) would abort
    the whole job with INVALID_ARRAY_INDEX_IN_ELEMENT_AT (review
    finding). try_element_at yields NULL, the NULL poisons the sum, and
    ``case when NULL > 0`` takes the else arm — sign bit 0, which is
    byte-for-byte what the DuckDB twin (oracles.duck_sign: ``l[i]`` is
    NULL out of range) already does, so ragged vectors land in bucket 0
    on BOTH engines instead of failing on one."""
    signs = [1 if h60(f"{plane}|{d}") & 1 else -1 for d in range(dim)]
    terms = " + ".join(
        f"({'' if s > 0 else '-'}"
        f"cast(try_element_at({vec_col}, {d + 1}) as double))"
        for d, s in enumerate(signs)
    )
    return f"(case when ({terms}) > 0 then 1 else 0 end)"


def rp_lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): bucket = sum over planes of sign_bit << plane."""
    bucket_expr = " + ".join(
        f"cast({hyperplane_sign_expr(vec_col, p, dim)} as bigint) * {1 << p}"
        for p in range(n_planes)
    )
    return vectors.select(
        F.col(id_col), F.expr(bucket_expr).alias("bucket")
    )


def ann_topk_lsh(
    vectors: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to same-bucket pairs
    (equi-join on bucket), then exact cosine + windowed rank within bucket."""
    from .partitioning import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors)
    b = rp_lsh_buckets(vectors, n_planes, dim, id_col, vec_col)
    v = _bucketed_norm_frame(vectors, b, "bucket", id_col, vec_col)
    left = v.select(
        F.col(id_col).alias("qid"), "bucket", F.col(vec_col).alias("_va"), F.col("_norm").alias("_na")
    )
    right = v.select(
        F.col(id_col).alias("neighbor_id"), "bucket", F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb")
    )
    pairs = (
        left.join(right, "bucket")
        .where(F.col("qid") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.expr(_dot("_va", "_vb")) / (F.col("_na") * F.col("_nb")))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qid").alias("vec_id"), "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold — the reference's embedding-cosine
    duplicate criterion (clustering.py:169-185) as a relational self-join.
    Returns (id_a, id_b, cos_sim), a < b. Exact form for oracle checking;
    at scale feed rp_lsh_buckets candidates instead of the cross join."""
    n = with_norm(vectors, vec_col)
    a = n.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na"))
    b = n.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.expr(_dot("_va", "_vb")) / (F.col("_na") * F.col("_nb")))
        .where(F.col("cos_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cos_sim")
    )


def duplicate_ratio(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector max cosine vs the rest of the corpus — the reference's
    get_duplicate_ratio (clustering.py:169-185). (vec_id, dup_ratio)."""
    n = with_norm(vectors, vec_col)
    a = n.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na"))
    b = n.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb"))
    return (
        a.crossJoin(b)
        .where(F.col("qid") != F.col("nid"))
        .withColumn("cos", F.expr(_dot("_va", "_vb")) / (F.col("_na") * F.col("_nb")))
        .groupBy(F.col("qid").alias("vec_id"))
        .agg(F.max("cos").alias("dup_ratio"))
    )


def duplicate_ratio_ann(
    vectors: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PRODUCTION duplicate-ratio: per-vector max cosine restricted to
    same-RP-LSH-bucket candidates (equi-join on bucket — shuffle hash join,
    AQE-splittable), vectors alone in their bucket get 0.0. This is the
    100 TB-safe wiring of the reference's get_duplicate_ratio
    (clustering.py:169-185): candidate space shrinks ~2^n_planes vs the
    all-pairs ``duplicate_ratio`` (kept as the oracle-checkable exact spec).
    Returns (vec_id, dup_ratio) for EVERY input vector."""
    from .partitioning import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors)
    b = rp_lsh_buckets(vectors, n_planes, dim, id_col, vec_col)
    v = _bucketed_norm_frame(vectors, b, "bucket", id_col, vec_col)
    left = v.select(
        F.col(id_col).alias("qid"), "bucket", F.col(vec_col).alias("_va"), F.col("_norm").alias("_na")
    )
    right = v.select(
        F.col(id_col).alias("nid"), "bucket", F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb")
    )
    max_cos = (
        left.join(right, "bucket")
        .where(F.col("qid") != F.col("nid"))
        .withColumn("cos", F.expr(_dot("_va", "_vb")) / (F.col("_na") * F.col("_nb")))
        .groupBy(F.col("qid").alias(id_col))
        .agg(F.max("cos").alias("_max_cos"))
    )
    return (
        vectors.select(id_col)
        .join(max_cos, id_col, "left")
        .select(
            id_col, F.coalesce("_max_cos", F.lit(0.0)).alias("dup_ratio")
        )
    )


def cluster_score_col(dup_ratio_col: str, threshold: float = 0.85):
    """J3 cluster score (clustering.py:187-207) as a native Column:
      ratio >= thr: max(0, 0.2 * (1 - (ratio - thr)/(1 - thr)))
      else:        min(1, 0.8 + 0.2 * (1 - ratio/thr))
    """
    r = F.col(dup_ratio_col)
    over = F.greatest(
        F.lit(0.0),
        F.lit(0.2) * (F.lit(1.0) - (r - F.lit(threshold)) / F.lit(1.0 - threshold)),
    )
    under = F.least(
        F.lit(1.0), F.lit(0.8) + F.lit(0.2) * (F.lit(1.0) - r / F.lit(threshold))
    )
    return F.when(r >= F.lit(threshold), over).otherwise(under)


def quantize_int8(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization per vector (the storage path for
    billion-vector corpora: 4x smaller than float32, dot products stay
    SIMD-friendly): scale = max(|x|)/127, q_i = round(x_i/scale), plus the
    max reconstruction error. All native exprs (whole-stage codegen);
    zero vectors quantize to all-zero with scale 0. Returns
    (vec_id, scale, q: array<int>, max_err)."""
    mx = f"aggregate({vec_col}, cast(0.0 as double), (m, x) -> greatest(m, abs(cast(x as double))))"
    scale = f"({mx} / 127.0)"
    q = (
        f"transform({vec_col}, x -> cast(round(cast(x as double) / nullif({scale}, 0.0)) as int))"
    )
    # reconstruct and take the max absolute error (0 for zero vectors)
    err = (
        f"aggregate(zip_with({vec_col}, {q}, (x, qq) -> "
        f"abs(cast(x as double) - coalesce(qq, 0) * {scale})), "
        "cast(0.0 as double), (m, e) -> greatest(m, e))"
    )
    return vectors.select(
        F.col(id_col),
        F.expr(scale).alias("scale"),
        F.expr(f"transform({q}, v -> coalesce(v, 0))").alias("q"),
        F.expr(err).alias("max_err"),
    )


def seed_centroids(
    vectors: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid seeds: the ``n_cells`` lowest-id vectors.
    orderBy+limit => TakeOrderedAndProject (per-partition top-k + driver
    merge of n_cells rows), NOT a global single-partition Window sort."""
    return (
        vectors.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("c"))
        .orderBy(F.col("cid").asc())
        .limit(n_cells)
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment by squared L2 (argmin, centroid-id
    tie-break) against a broadcast ``(cid, c)`` centroid table. Returns
    (id_col, cell), plus the input vector as ``__vec`` when ``keep_vec``
    (so iterative callers avoid a join back onto the vector table).

    The argmin is ``min(struct(d2, cid))`` — a HASH AGGREGATE with map-side
    partials, not a row_number window: the window form sorts the full
    n*k pair stream inside one shuffle (round-8 guide §2.4 — an aggregate
    keyed the same way needs no sort and partially combines map-side, so
    only ~n rows reach the reducer). Equivalence incl. NULL d2 is exact:
    struct comparison orders NULL fields first, identical to the window's
    ``orderBy(d2.asc)`` NULLS FIRST (pinned by tests/test_similarity_unroll
    .py::test_assign_cells_argmin_matches_window).

    The distance expression is unrolled to a whole-stage-codegen sum when
    both arrays are exactly ``_UNROLL_DIM`` long (same doctrine and
    bit-identity argument as :func:`_dot`); other shapes take the original
    interpreted fold."""
    dim = _UNROLL_DIM
    dist_hof = (
        "aggregate(zip_with(v, c, (x, y) -> (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))), cast(0.0 as double),"
        " (acc, d) -> acc + d)"
    )
    sq_terms = "".join(
        f" + ((cast(element_at(v, {i}) as double) - cast(element_at(c, {i}) as double))"
        f" * (cast(element_at(v, {i}) as double) - cast(element_at(c, {i}) as double)))"
        for i in range(1, dim + 1)
    )
    dist = (
        f"(case when size(v) = {dim} and size(c) = {dim} "
        f"then (cast(0.0 as double){sq_terms}) else {dist_hof} end)"
    )
    pairs = (
        vectors.select(F.col(id_col), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("d2", F.expr(dist))
    )
    aggs = [F.min(F.struct(F.col("d2"), F.col("cid"))).alias("__am")]
    cols = [F.col(id_col), F.col("__am.cid").alias("cell")]
    if keep_vec:
        # the vector is constant within an id group (it came from the left
        # side of the centroid cross join), so first() is deterministic —
        # carrying it through the aggregate saves the join back onto the
        # vector table that kmeans_fit's per-iteration loop used to pay
        aggs.append(F.first("v").alias("__vec"))
        cols.append(F.col("__vec"))
    return pairs.groupBy(id_col).agg(*aggs).select(*cols)


def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: centroids are the ``n_cells`` lowest-id vectors
    (deterministic, no training dependency); each vector goes to its nearest
    centroid by squared L2 (argmin, centroid-id tie-break). Returns
    (vec_id, cell).

    The scale path: centroids come from a proper sampled k-means in practice
    (``kmeans_fit``); the assignment/search plumbing (broadcast centroid
    table, argmin select, within-cell probe join) is identical and is what
    this operator establishes — deterministically, so the DuckDB oracle can
    check it."""
    return assign_cells(
        vectors, seed_centroids(vectors, n_cells, id_col, vec_col), id_col, vec_col
    )


def ivf_topk(
    vectors: DataFrame,
    k: int = 3,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: exact cosine top-k restricted to same-cell candidates."""
    from pyspark.sql.window import Window

    from .partitioning import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors)
    cells = ivf_assign(vectors, n_cells, id_col, vec_col)
    v = _bucketed_norm_frame(vectors, cells, "cell", id_col, vec_col)
    left = v.select(
        F.col(id_col).alias("qid"), "cell", F.col(vec_col).alias("_va"), F.col("_norm").alias("_na")
    )
    right = v.select(
        F.col(id_col).alias("neighbor_id"), "cell", F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb")
    )
    pairs = (
        left.join(right, "cell")
        .where(F.col("qid") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.expr(_dot("_va", "_vb")) / (F.col("_na") * F.col("_nb")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qid").alias("vec_id"), "neighbor_id", "cos_sim", "rank")
    )


def _kmeans_driver(spark, src, k: int, iters: int, cent_schema: str):
    """Driver-side Lloyd over a collected (``__kid``, ``__v``) frame — the
    small-input arm of kmeans_fit's size-adaptive cutover (the
    connected_components doctrine: pick the physical strategy by runtime
    statistics). Rules are identical to the distributed path (lowest-id
    seeds, L2 argmin with centroid-id tie-break, empty cell keeps its
    previous centroid), so the result matches to float-summation order —
    exactly the operator's stated determinism contract, and byte-for-byte
    the reference the differential test compares against.

    Returns None when the collected vectors are irregular (NULL or ragged
    rows) — those carry engine-specific NULL semantics the distributed
    expressions define, so the caller falls through to the Spark path."""
    import numpy as np

    pdf = src.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], cent_schema)
    vec_list = pdf["__v"].tolist()
    if any(v is None for v in vec_list) or len(
        {len(v) for v in vec_list}
    ) != 1:
        return None
    pdf = pdf.sort_values("__kid", kind="mergesort").reset_index(drop=True)
    ids = pdf["__kid"].tolist()
    vecs = np.array(pdf["__v"].tolist(), dtype=np.float64)
    cids = ids[: int(k)]
    cents = vecs[: int(k)].copy()
    for _ in range(max(0, int(iters))):
        # |v - c|^2 via the expansion form: n x k memory instead of the
        # naive n x k x dim broadcast intermediate (5 GB at the 100k-row
        # threshold). Differs from the per-element form only in float
        # rounding ~1e-12 relative — inside the operator's determinism
        # contract (and the test tolerance).
        d2 = (
            (vecs * vecs).sum(axis=1)[:, None]
            + (cents * cents).sum(axis=1)[None, :]
            - 2.0 * (vecs @ cents.T)
        )
        assign = d2.argmin(axis=1)  # first occurrence == lowest cid
        for j in range(len(cids)):
            m = assign == j
            if m.any():
                cents[j] = vecs[m].mean(axis=0)
    return spark.createDataFrame(
        [
            (cid, [float(x) for x in cents[i]])
            for i, cid in enumerate(cids)
        ],
        cent_schema,
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column; returns the
    trained ``(cid, c)`` centroid table (k rows, ready for
    ``assign_cells``/``semdedup``). Deterministic: seeds are the k
    lowest-id vectors (``seed_centroids``), assignment ties break on
    centroid id, and an emptied cell keeps its previous centroid — so the
    result is a pure function of the input SET (no RNG, retry/partition
    independent up to float partial-sum order in avg; differential-tested
    against a driver-side numpy Lloyd with the same rules).

    Scale shape: the input is localCheckpointed ONCE (CLAUDE.md iterative-
    loop doctrine — without it every iteration re-executes the upstream
    lineage); each iteration is one broadcast crossJoin + argmin (map-side,
    k-row windows) and ONE shuffle whose reduce side is at most k*dim
    partial-mean rows (posexplode + groupBy(cell, dim) with map-side
    combine); the k*dim means come to the driver (tiny) and go back out as
    the next broadcast literal. Nothing vector-sized ever keys a shuffle.
    """
    from pyspark.sql import Observation

    from .partitioning import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors)
    obs = Observation("kmeans_n")
    src = (
        vectors.select(
            F.col(id_col).alias("__kid"),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("__v"),
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # cid inherits the INPUT id type (review finding: forcing int()/bigint
    # crashed string-keyed corpora, which every sibling operator accepts)
    cid_type = vectors.schema[id_col].dataType.simpleString()
    cent_schema = f"cid {cid_type}, c array<double>"
    spark = vectors.sparkSession
    # Size-adaptive cutover (connected_components doctrine; the row count
    # rides the checkpoint job via observe() — zero extra jobs): below the
    # threshold the whole Lloyd loop runs as ONE Arrow collect + numpy on
    # the driver instead of 2 jobs per iteration of distributed
    # assignment/means — measured ~2 s per bench semdedup stage at 2000
    # vectors, where the distributed loop is pure stage latency. At 100k
    # rows x 64 dims the collect is ~50 MB — comfortably inside the driver
    # budget (_cc_driver's 2M-edge doctrine); larger inputs take the
    # distributed loop below, unchanged.
    if obs.get["n"] <= driver_threshold:
        out = _kmeans_driver(spark, src, k, iters, cent_schema)
        if out is not None:
            return out
    cents = [
        (r["cid"], [float(x) for x in r["c"]])
        for r in seed_centroids(src, k, "__kid", "__v").collect()
    ]
    for _ in range(max(0, int(iters))):
        cdf = spark.createDataFrame(cents, cent_schema)
        # NOTE (round 8, measured): carrying the vector through the argmin
        # aggregate (assign_cells keep_vec=True) was tried and REJECTED —
        # an array-typed aggregation buffer drops the argmin out of the
        # fast hash aggregate, and the interleaved A/B read 7.5 s vs 4.1 s
        # for this join-back shape (BENCH note in OPTIMIZATION_r08.md).
        # The join stays: AQE broadcasts the slim (id, cell) side.
        assigned = assign_cells(src, cdf, "__kid", "__v").join(src, "__kid")
        # per-cell element-wise mean: one slim (cell, dim) shuffle. The
        # k*dim mean rows come straight to the driver and are assembled
        # into vectors in Python — the former second aggregation
        # (groupBy(cell) + sorted collect_list) was one more exchange per
        # Lloyd iteration spent re-grouping <= k*dim rows the driver
        # collects anyway (round 8; identical values, same per-cell
        # (cell, dim) averages).
        means = (
            assigned.select("cell", F.posexplode("__v").alias("__d", "__x"))
            .groupBy("cell", "__d")
            .agg(F.avg("__x").alias("__m"))
            .collect()
        )
        new: dict = {}
        for r in means:
            new.setdefault(r["cell"], {})[r["__d"]] = float(r["__m"])
        cents = [
            (
                cid,
                [v for _, v in sorted(new[cid].items())]
                if cid in new
                else c,
            )
            for cid, c in cents
        ]
    return spark.createDataFrame(cents, cent_schema)


def semdedup(
    vectors: DataFrame,
    n_cells: int = 8,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding — cluster the corpus, then inside each
    cluster drop every item whose cosine similarity to an EARLIER item
    (lower id — deterministic stand-in for the paper's keep-one rule)
    reaches ``tau``. The reference's own similarity matrix
    (/root/reference/utils/embed.py:58-82) is the driver-bound O(n^2)
    form of the same idea; clustering bounds the pair space to
    sum-of-cell-sizes squared.

    Returns (id_col, cell, max_prior_cos, semdedup_keep): the max cosine
    to any earlier same-cell item (NULL when the item is its cell's
    first) and the keep verdict ``max_prior_cos IS NULL OR < tau``.

    Gate form (``centroids=None``): deterministic lowest-id seeds
    (``ivf_assign``) so the DuckDB oracle can recompute the cells; the
    cosine fold is the proven index-ordered ``_dot`` so the float is
    bit-identical across engines. Production form: pass
    ``centroids=kmeans_fit(vectors, k, iters)`` with k sized so cells hold
    ~1-10k items (the paper grows k with n); the within-cell self-join is
    then n*cell_size work on slim (id, vector) rows, hot cells split by
    AQE skew handling, and the max-per-id aggregate is partial (map-side
    combine) so no cell's pair list ever materializes in one task."""
    from .partitioning import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors)
    cells = (
        ivf_assign(vectors, n_cells, id_col, vec_col)
        if centroids is None
        else assign_cells(vectors, centroids, id_col, vec_col)
    )
    v = _bucketed_norm_frame(vectors, cells, "cell", id_col, vec_col)
    left = v.select(
        F.col(id_col).alias("__qid"),
        "cell",
        F.col(vec_col).alias("_va"),
        F.col("_norm").alias("_na"),
    )
    right = v.select(
        F.col(id_col).alias("__pid"),
        "cell",
        F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    prior = (
        left.join(right, "cell")
        .where(F.col("__pid") < F.col("__qid"))
        .withColumn(
            "__cos", F.expr(_dot("_va", "_vb")) / (F.col("_na") * F.col("_nb"))
        )
        .groupBy("__qid")
        .agg(F.max("__cos").alias("max_prior_cos"))
    )
    # the (id, cell) side reads the SAME checkpointed frame — not `cells`,
    # whose lineage would re-run the whole assignment a second time
    ids = v.select(id_col, "cell")
    return ids.join(prior, ids[id_col] == prior["__qid"], "left").select(
        id_col,
        "cell",
        "max_prior_cos",
        (
            F.col("max_prior_cos").isNull()
            | (F.col("max_prior_cos") < F.lit(float(tau)))
        ).alias("semdedup_keep"),
    )
