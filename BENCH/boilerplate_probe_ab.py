"""A/B: remove_boilerplate's per-line membership probe — interpreted-lambda
array_contains scan (O(|set|) per line, zero driver round-trip) vs
Arrow-batched pandas UDF over a broadcast frozenset (O(1) per line, one
driver collect + one Arrow text round-trip). Round-5 VERDICT item 7; the
exploded-join form it floated is rejected on SHAPE (re-assembling per-doc
text after explode shuffles line text keyed by id — breaks the operator's
no-text-shuffle contract), so the race is lambda vs pandas.

Corpus: n_docs synthetic docs, each 20 unique lines + 5 lines drawn from a
boilerplate pool of |pool| lines; min_docs=3 admits (essentially) the whole
pool, so |set| == |pool| is the experimental knob. Equality of both forms'
outputs is asserted per cell (sum of crc32(clean_text), sum n_lines_removed).

Usage: python BENCH/boilerplate_probe_ab.py [n_docs]   (default 200000)
Appends JSON lines to BENCH/boilerplate_probe_ab_runs.jsonl.
Run with NOTHING else on the machine (CLAUDE.md contamination rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "BENCH", "boilerplate_probe_ab_runs.jsonl")
POOL_SIZES = (16, 1024, 16384)


def main(n_docs: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from chinese_corpus_cleaning_spark.operators.textanalysis import (
        remove_boilerplate,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("boilerplate-probe-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    entrymod._ensure_pyfiles(spark)

    for pool in POOL_SIZES:
        # 20 unique lines (md5 of id x j) + 5 pool lines, all native exprs
        docs = (
            spark.range(0, n_docs, 1, 32)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    "\n",
                    F.expr(
                        "transform(sequence(1, 20),"
                        " j -> md5(concat(cast(id as string), '_', j)))"
                    ),
                    F.expr(
                        "transform(sequence(1, 5),"
                        f" j -> concat('BOILER_', (id * 7 + j * 131) % {pool}))"
                    ),
                ).alias("text"),
            )
            .localCheckpoint(eager=True)
        )

        def run(probe: str) -> tuple[float, tuple]:
            t0 = time.perf_counter()
            row = (
                remove_boilerplate(
                    docs, min_docs=3, probe=probe
                )
                .agg(
                    F.sum(F.crc32(F.encode("clean_text", "UTF-8"))).alias("h"),
                    F.sum("n_lines_removed").alias("r"),
                )
                .collect()[0]
            )
            return round(time.perf_counter() - t0, 2), (row["h"], row["r"])

        cell = {"n_docs": n_docs, "pool": pool}
        for probe in ("lambda", "pandas"):
            walls, sig = [], None
            for _ in range(2):
                w, s = run(probe)
                walls.append(w)
                sig = s
            cell[probe] = min(walls)
            cell[f"{probe}_runs"] = walls
            cell[f"{probe}_sig"] = sig
        assert cell["lambda_sig"] == cell["pandas_sig"], cell
        cell["speedup_pandas"] = round(cell["lambda"] / cell["pandas"], 2)
        print(json.dumps(cell), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(cell) + "\n")
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
