"""LSH candidate-volume sweep: band geometry vs bucket cap (+ star rescue).

Round-4 verdict: at 1.6M docs the LSH band join + est-Jaccard stages are
352s of the 444s dedup wall and are the DRAM-bound phases capping scaling
efficiency at ~0.66 — "fewer candidates means less DRAM-bound join work at
every parallelism". Two levers:

  * band GEOMETRY (rows per band): widening 8 -> 16 rows steepens the
    S-curve for everyone — P(candidate | J=0.85) falls 0.99 -> 0.46 — so it
    cuts junk and REAL pairs alike (measured -3.8% duplicates at 100k).
  * bucket CAP + star rescue: approximates only inside dense buckets
    (the template/boilerplate cliques that generate the quadratic junk),
    keeping the global recall curve intact. Oversized buckets degrade to
    min-id-hub star candidates instead of being skipped (linear cost,
    keeps the clique one component).

Each leg runs dedup_representatives on the identical generated corpus in a
fresh JVM (subprocess), interleaved, with loadavg logged per leg. Duplicate
counts are deterministic per (corpus, config) — the recall column is exact,
only wall seconds carry host noise.

Usage:
  python BENCH/band_geometry_ab.py                 # 100k sweep @ local[8]
  python BENCH/band_geometry_ab.py worker <cpus> <n_docs> <num_bands> <cap>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def worker(cpus: int, n_docs: int, num_bands: int, cap: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from chinese_corpus_cleaning_spark.config import DedupConfig
    from chinese_corpus_cleaning_spark.operators import dedup
    from chinese_corpus_cleaning_spark.sources import gen

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    entrymod._ensure_pyfiles(spark)
    cfg = DedupConfig(num_bands=num_bands)
    docs = (
        gen.docs_df(spark, n_docs, partitions=cpus * 4)
        .select(F.col("url").alias("doc_id"), "text")
        .cache()
    )
    docs.count()
    dedup.with_minhash(docs.limit(64)).agg(F.count(F.lit(1))).collect()
    load0 = os.getloadavg()[0]
    t0 = time.perf_counter()
    n, nd = (
        dedup.dedup_representatives(docs, cfg, max_band_bucket=cap or None)
        .agg(F.count(F.lit(1)), F.sum(F.col("is_duplicate").cast("long")))
        .collect()[0]
    )
    sec = round(time.perf_counter() - t0, 2)
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "num_bands": num_bands,
                "cap": cap,
                "sec": sec,
                "n_dup": nd,
                "loadavg_start": round(load0, 2),
                "loadavg_end": round(os.getloadavg()[0], 2),
            }
        )
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # legs: (num_bands, cap); cap 0 = uncapped. Interleave two rounds.
    legs = [(16, 256), (16, 64), (8, 256)]
    results = []
    for _ in range(2):
        for nb, cap in legs:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker",
                 str(cpus), str(n_docs), str(nb), str(cap)],
                capture_output=True, text=True, check=True, cwd=REPO,
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            results.append(rec)
            print(json.dumps(rec), flush=True)
    best = {}
    for r in results:
        k = (r["num_bands"], r["cap"])
        best[k] = min(best.get(k, 1e9), r["sec"])
    print(json.dumps({"min_sec": {f"bands{k[0]}_cap{k[1]}": v for k, v in best.items()}}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(*(int(a) for a in sys.argv[2:6]))
    else:
        main()
