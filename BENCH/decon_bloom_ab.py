"""A/B: benchmark decontamination — exact broadcast-join form
(decontaminate_overlap: corpus-side explode -> broadcast semi-join ->
per-doc count shuffle) vs the bloom probe (decontaminate_bloom: benchmark
grams folded into a ~2.9-bytes/gram bitmap, corpus probed in ONE
Exchange-free mapInPandas pass).

Corpus: n_docs synthetic docs of 50 unique 8-char tokens; every 10th doc
embeds one benchmark 8-gram window. Benchmark: n_bench docs of 8 tokens.
Agreement asserted per cell: the bloom answer DOMINATES the exact one
(one-sided error — sum(n_overlap) and contaminated count are >=), and the
excess is recorded: ~n_docs*grams_per_doc*fpp expected false-positive gram
hits (at 200k docs x ~50 grams x 1e-6 that's ~10 docs, and the measured
run showed exactly +10 — the bound is tight, not slack).

Usage: python BENCH/decon_bloom_ab.py [n_docs] [n_bench]  (default 200000 2000)
Appends JSON lines to BENCH/decon_bloom_ab_runs.jsonl.
Run with NOTHING else on the machine (CLAUDE.md contamination rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "BENCH", "decon_bloom_ab_runs.jsonl")
N = 8


def main(n_docs: int, n_bench: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from chinese_corpus_cleaning_spark.operators.textanalysis import (
        decontaminate_bloom,
        decontaminate_overlap,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("decon-bloom-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    entrymod._ensure_pyfiles(spark)

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
                F.expr(
                    f"case when id % 10 = 0 then array_join(transform(sequence(1, 8),"
                    f" j -> concat('B', cast(id % {n_bench} as string), '_',"
                    f" cast(j as string))), ' ') else '' end"
                ),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    def run(form: str) -> tuple[float, tuple]:
        t0 = time.perf_counter()
        out = (
            decontaminate_overlap(docs, bench, n=N)
            if form == "exact"
            else decontaminate_bloom(docs, bench, n=N, fpp=1e-6)
        )
        row = out.agg(
            F.sum("n_overlap").alias("s"),
            F.count_if("contaminated").alias("c"),
        ).collect()[0]
        return round(time.perf_counter() - t0, 2), (row["s"], row["c"])

    cell = {"n_docs": n_docs, "n_bench": n_bench, "n": N}
    for form in ("exact", "bloom"):
        walls, sig = [], None
        for _ in range(3):
            w, s = run(form)
            walls.append(w)
            sig = s
        cell[form] = min(walls)
        cell[f"{form}_runs"] = walls
        cell[f"{form}_sig"] = sig
    # one-sided error: bloom dominates exact; the excess is the FP count
    assert cell["bloom_sig"][0] >= cell["exact_sig"][0], cell
    assert cell["bloom_sig"][1] >= cell["exact_sig"][1], cell
    cell["fp_docs"] = cell["bloom_sig"][1] - cell["exact_sig"][1]
    cell["speedup_bloom"] = round(cell["exact"] / cell["bloom"], 2)
    print(json.dumps(cell), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(cell) + "\n")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 200_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2_000,
    )
