"""Scale + scaling-efficiency readings for the late round-7 operators:
bm25_topk (zero-wide-shuffle single-query retrieval), decontaminate_remove
(Exchange-free Arrow span rewrite), bpe_encode (broadcast merge table, one
Arrow pass), normalize_text (native width fold + NFC Arrow pass).

Corpus: n_docs synthetic docs of 50 unique 8-char md5 tokens; every 10th
doc embeds one benchmark 8-gram window (the decon corpus shape); every 3rd
doc carries one of three planted query terms at varying frequency (BM25
needs non-degenerate df); every 2nd doc gets a full-width + decomposed
suffix (normalize must do real work). The BPE merge table (64 merges) is
trained once on a 2k-doc sample OUTSIDE the timed region — encode is the
scale path being measured.

Every stage is min-of-3 within one JVM (the bench noise doctrine,
BENCH/BASELINE.md). Pass cores to read the same work at two parallelism
levels for the north-rule scaling-efficiency evidence.

Usage: python BENCH/late_ops_bench.py [n_docs] [cores]  (default 400000 8)
Appends JSON lines to BENCH/late_ops_runs.jsonl.
Run with NOTHING else on the machine (CLAUDE.md contamination rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "BENCH", "late_ops_runs.jsonl")


def main(n_docs: int, cores: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from chinese_corpus_cleaning_spark.functions.unicode_norm import (
        normalize_text,
    )
    from chinese_corpus_cleaning_spark.operators.retrieval import bm25_topk
    from chinese_corpus_cleaning_spark.operators.textanalysis import (
        decontaminate_remove,
    )
    from chinese_corpus_cleaning_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
    )

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("late-ops-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    entrymod._ensure_pyfiles(spark)

    n_bench = 2_000
    bench = (
        spark.range(0, n_bench, 1, 4)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(1, 8),"
                " j -> concat('B', cast(id as string), '_', cast(j as string))), ' ')"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    docs = (
        spark.range(0, n_docs, 1, 32)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr(
                    "array_join(transform(sequence(1, 50),"
                    " j -> substring(md5(concat(cast(id as string), '_',"
                    " cast(j as string))), 1, 8)), ' ')"
                ),
                # planted BM25 terms at three df levels
                F.expr(
                    "case when id % 3 = 0 then 'spark' "
                    "when id % 9 = 1 then 'vector vector' "
                    "when id % 27 = 2 then 'customer' else '' end"
                ),
                # decon: every 10th doc embeds one benchmark 8-gram
                F.expr(
                    f"case when id % 10 = 0 then array_join(transform(sequence(1, 8),"
                    f" j -> concat('B', cast(id % {n_bench} as string), '_',"
                    f" cast(j as string))), ' ') else '' end"
                ),
                # normalize: every 2nd doc carries full-width + decomposed
                F.expr(
                    "case when id % 2 = 0 then"
                    " 'Ｔｅｓｔ１２３！"
                    "　café' else '' end"
                ),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    merges = bpe_train(docs.limit(2_000), n_merges=64)

    def stage(name, make):
        walls, sig = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            sig = make()
            walls.append(round(time.perf_counter() - t0, 2))
        return name, min(walls), walls, sig

    stages = {
        "bm25_topk": lambda: tuple(
            (r["doc_id"], str(r["score"]))
            for r in bm25_topk(
                docs, ["spark", "vector", "customer"], k=10
            ).collect()
        )[:3],
        "decon_remove": lambda: tuple(
            decontaminate_remove(docs, bench, n=8, pad=2)
            .agg(
                F.sum("n_tokens_removed").alias("t"),
                F.count_if("contaminated").alias("c"),
            )
            .collect()[0]
        ),
        "bpe_encode": lambda: tuple(
            bpe_encode(docs, merges)
            .agg(F.sum("n_bpe_tokens").alias("s"))
            .collect()[0]
        ),
        "normalize": lambda: tuple(
            normalize_text(docs)
            .agg(
                F.sum(F.length("norm_text")).alias("s"),
                F.count_if(F.col("norm_text") != F.col("text")).alias("c"),
            )
            .collect()[0]
        ),
    }
    cell = {"n_docs": n_docs, "cores": cores, "n_merges": len(merges)}
    for name, make in stages.items():
        _, best, walls, sig = stage(name, make)
        cell[name] = best
        cell[f"{name}_runs"] = walls
        cell[f"{name}_sig"] = sig
        cell[f"{name}_docs_per_sec"] = round(n_docs / best, 1)
    print(json.dumps(cell), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(cell) + "\n")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 400_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
