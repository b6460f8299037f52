"""Round-7 data-recipe operators: temperature source mixing and the
deterministic hash split (operators/sampling.source_mix / hash_split).

Both are corpus-level curation beyond the reference (its pipeline filters
documents; it never re-weights sources or splits the corpus). Public basis:
GPT-3 non-proportional source sampling (Brown et al. 2020 table 2.2), The
Pile per-source epochs (Gao et al. 2020), mT5/CCNet temperature sampling
p_s ∝ n_s^alpha (Xue et al. 2021 §3.1; Wenzek et al. 2020); split-by-hash
is standard large-corpus practice (e.g. TFDS deterministic subsplits).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chinese_corpus_cleaning_spark.operators.sampling import (
    hash_split,
    source_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    # skewed sources: one 700-doc head, three rare tails (~33 each)
    return spark.range(800).select(
        F.col("id").alias("doc_id"),
        F.expr("concat('s', cast(least(id % 24, 3) as string))").alias(
            "source"
        ),
        F.expr("concat('text ', cast(id as string))").alias("text"),
    )


def _rates(out):
    return {
        r.source: (r.mix_n, r.mix_rate)
        for r in out.select("source", "mix_n", "mix_rate")
        .distinct()
        .collect()
    }


def test_source_mix_deterministic_and_partition_invariant(docs):
    a = source_mix(docs, budget=300).orderBy("doc_id").collect()
    b = (
        source_mix(docs.repartition(13), budget=300)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b
    # re-run == same sample (no RNG anywhere)
    c = source_mix(docs, budget=300).orderBy("doc_id").collect()
    assert a == c


def test_source_mix_alpha_one_is_proportional(docs):
    out = source_mix(docs, budget=300, alpha=1.0)
    rates = _rates(out)
    vals = {round(p, 12) for _, p in rates.values()}
    assert len(vals) == 1  # p_s = budget / N for every source
    assert abs(next(iter(vals)) - 300 / 800) < 1e-9


def test_source_mix_flattens_toward_rare_sources(docs):
    prop = _rates(source_mix(docs, budget=300, alpha=1.0))
    flat = _rates(source_mix(docs, budget=300, alpha=0.5))
    # rare source upweighted, head source downweighted
    assert flat["s0"][1] > prop["s0"][1]
    assert flat["s3"][1] < prop["s3"][1]
    # alpha=0: expected kept docs equal per source (rate*n constant),
    # modulo the p<=1 clamp on the rare sources
    unif = _rates(source_mix(docs, budget=40, alpha=0.0))
    per_source = {s: n * p for s, (n, p) in unif.items()}
    assert max(per_source.values()) - min(per_source.values()) < 1e-6


def test_source_mix_rate_clamps_at_one(docs):
    out = _rates(source_mix(docs, budget=790, alpha=0.25))
    assert out["s0"][1] == 1.0  # rare source fully kept
    assert all(p <= 1.0 for _, p in out.values())
    # p == 1 keeps EVERY doc of that source (threshold 2^60 > any h60)
    full = source_mix(docs, budget=790, alpha=0.25)
    s0 = full.where("source = 's0'")
    assert s0.count() == s0.where("sampled").count()


def test_source_mix_expected_total_near_budget(docs):
    kept = source_mix(docs, budget=300, alpha=0.5).where("sampled").count()
    # h60 is uniform; 300 expected over ~800 Bernoulli draws
    assert 240 <= kept <= 360


def test_source_mix_null_source_is_its_own_group(spark):
    d = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.expr("case when id % 4 = 0 then null else 'a' end").alias("source"),
    )
    out = source_mix(d, budget=50)
    nulls = out.where("source is null")
    assert nulls.count() == 25
    assert nulls.where("mix_n is null").count() == 0  # joined, not dropped
    assert nulls.select("mix_n").distinct().collect()[0][0] == 25


def test_source_mix_rejects_non_dyadic_alpha(docs):
    with pytest.raises(ValueError, match="alpha"):
        source_mix(docs, budget=10, alpha=0.3)
    with pytest.raises(ValueError, match="budget"):
        source_mix(docs, budget=-1)


def test_source_mix_doc_side_is_broadcast_joined(docs):
    """The document side (text included) must cross ZERO shuffles: rates
    come back via broadcast, so the only exchange in the whole plan is the
    slim per-source count aggregation."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        source_mix(docs, budget=300).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exchanges only on the aggregated source counts, never on doc rows
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "doc_id" not in line and "text" not in line


def test_hash_split_exhaustive_disjoint_and_stable(docs):
    out = hash_split(docs)
    assert out.count() == 800
    labels = {r.split for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "valid", "test"}
    # subset-invariance: assignments of surviving docs never move when
    # other docs are removed (the anti-leakage property randomSplit lacks)
    full = {r.doc_id: r.split for r in out.collect()}
    sub = {
        r.doc_id: r.split
        for r in hash_split(docs.where("doc_id % 3 = 0")).collect()
    }
    assert all(full[k] == v for k, v in sub.items())


def test_hash_split_proportions_and_salt_independence(docs):
    out = hash_split(
        docs, weights=(("train", 80), ("valid", 10), ("test", 10))
    )
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(
        F.count("*").alias("cnt")).collect()}
    assert 560 <= counts["train"] <= 720
    assert 40 <= counts["valid"] <= 130
    assert 40 <= counts["test"] <= 130
    other = {
        r.doc_id: r.split
        for r in hash_split(docs, salt="exp2").collect()
    }
    base = {r.doc_id: r.split for r in out.collect()}
    assert any(other[k] != base[k] for k in base)  # independent draw


def test_hash_split_single_label_and_validation(docs, spark):
    one = hash_split(docs, weights=(("all", 1),))
    assert one.where("split <> 'all'").count() == 0
    with pytest.raises(ValueError, match="duplicate"):
        hash_split(docs, weights=(("a", 1), ("a", 2)))
    with pytest.raises(ValueError, match="positive"):
        hash_split(docs, weights=(("a", 1), ("b", 0)))
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(docs, weights=())


def test_untrusted_salt_seed_labels_are_escaped(docs):
    """salt/seed/split labels are user strings spliced into SQL expression
    text; quotes and backslashes must be bound as literals, not lexed
    (review finding: hash_split(salt="exp'1") raised ParseException).
    The escaped forms must both PLAN and keep hash-split determinism."""
    tricky_salt = "exp'1\\x"
    out = hash_split(
        docs,
        weights=(("train's", 9), ("te\\st", 1)),
        salt=tricky_salt,
    )
    counts = {
        r.split: r.cnt
        for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(counts) == {"train's", "te\\st"} and sum(counts.values()) == 800
    # same salt reproduces; the quoted salt is a REAL key (differs from
    # its quote-stripped cousin)
    again = {r.doc_id: r.split for r in
             hash_split(docs, weights=(("train's", 9), ("te\\st", 1)),
                        salt=tricky_salt).collect()}
    base = {r.doc_id: r.split for r in out.collect()}
    assert again == base
    mix = source_mix(docs, budget=100, seed="mix'seed")
    assert mix.where("sampled").count() > 0


def test_hash_split_is_pure_map(docs):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        hash_split(docs).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan  # no shuffle anywhere


def test_export_path_composes(spark):
    """The full export tail of a training-data pipeline: temperature
    source mixing -> hash split -> sequence packing of the train split.
    Deterministic end-to-end (re-running the whole chain reproduces the
    identical shard layout), and the packing sees exactly the
    sampled-train subset."""
    from chinese_corpus_cleaning_spark.operators.sampling import (
        pack_sequences,
    )
    from chinese_corpus_cleaning_spark.sources import gen

    docs = gen.docs_df(spark, 240, partitions=8).select(
        F.split("url", "/").getItem(4).cast("long").alias("doc_id"),
        "text",
        F.expr(
            "concat('s', cast(least(cast(split(url, '/')[4] as long) % 12, 2) as string))"
        ).alias("source"),
    )
    mixed = source_mix(docs, budget=120, alpha=0.5)
    recipe = hash_split(mixed.where("sampled"), weights=(("train", 90), ("valid", 10)))
    train = recipe.where("split = 'train'")
    n_train = train.count()
    assert 0 < n_train < 240

    packed = pack_sequences(train, budget=256, n_buckets=8)
    assert packed.count() == n_train
    # contiguous token stream: max cum_tokens == sum of n_tokens
    agg = packed.agg(
        F.max("cum_tokens").alias("mx"), F.sum("n_tokens").alias("sm")
    ).collect()[0]
    assert agg.mx == agg.sm

    # end-to-end determinism across a re-run on a different partitioning
    packed2 = pack_sequences(
        hash_split(
            source_mix(docs.repartition(3), budget=120, alpha=0.5).where(
                "sampled"
            ),
            weights=(("train", 90), ("valid", 10)),
        ).where("split = 'train'"),
        budget=256,
        n_buckets=8,
    )
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, packed2.collect()))
    assert a == b
