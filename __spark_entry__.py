"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality-filter pipeline on the sf0.001
documents table; ``queries()`` / ``oracle_sql()`` expose every implemented
operator (plans/catalog.py + plans/oracles.py) for the DuckDB correctness
gate. tests/test_oracle_parity.py replicates the driver's comparison locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

SF0001 = "/root/testdata/sf0.001"


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Ship the package to executor workers (spark-submit --py-files
    equivalent); see chinese_corpus_cleaning_spark/sources/shipping.py."""
    from chinese_corpus_cleaning_spark.sources.shipping import ensure_pyfiles

    ensure_pyfiles(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full keep/drop + scrub pipeline (labels table) over the
    sf0.001 documents, using the full vendored 43k-word lexicon."""
    from pyspark.sql import functions as F

    from chinese_corpus_cleaning_spark.plans.pipeline import quality_filter_plan
    from chinese_corpus_cleaning_spark.sources.wordlists import broadcast_trie

    _ensure_pyfiles(spark)
    docs = (
        spark.read.parquet(f"{SF0001}/documents.parquet")
        .select(F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"), "text")
    )
    trie_bc = broadcast_trie(spark)
    labels = quality_filter_plan(docs, trie_bc, partitions=4)
    # struct/array columns flattened for a stable smoke-check schema
    return labels.select(
        "url",
        "keep",
        "quality_score",
        "rule_passed",
        "rule_score",
        "feature_score",
        "scrubbed_text",
        "error",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from chinese_corpus_cleaning_spark.plans.catalog import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_pyfiles(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from chinese_corpus_cleaning_spark.plans.oracles import build

    return build()
