"""Interleaved A/B of the dedup_representatives pipeline between TWO repo
checkouts (settling the round-3 `dedup_minhash` sf0.1 drift signal: did the
md5+semi-join dedup_edges restructure cost wall time at small scale?).

Methodology = BENCH/BASELINE.md round-2 A/B: one JVM per leg, strictly
serial, legs alternate A,B,A,B,... so both trees sample the same host
window; /proc/loadavg recorded around every leg.

Usage:
    python BENCH/dedup_ab.py <other_repo_path> [n_docs=20000] [cpus=32] [pairs=3]

Appends one JSON line per run to BENCH/dedup_ab_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
cpus, n_docs = int(sys.argv[2]), int(sys.argv[3])
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import __spark_entry__ as entrymod
from chinese_corpus_cleaning_spark.operators import dedup
from chinese_corpus_cleaning_spark.sources import gen
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
entrymod._ensure_pyfiles(spark)
docs = gen.docs_df(spark, n_docs, partitions=cpus).select(
    F.col("url").alias("doc_id"), "text").cache()
docs.count()
dedup.with_minhash(docs.limit(64)).agg(F.count(F.lit(1))).collect()
t0 = time.perf_counter()
dedup.dedup_representatives(docs).agg(
    F.count(F.lit(1)), F.sum(F.col("is_duplicate").cast("long"))).collect()
dt = time.perf_counter() - t0
spark.stop()
print(json.dumps({"sec": round(dt, 3)}))
"""


def loadavg() -> list[float]:
    return [float(x) for x in open("/proc/loadavg").read().split()[:3]]


def leg(repo: str, cpus: int, n_docs: int) -> dict:
    before = loadavg()
    out = subprocess.run(
        [sys.executable, "-c", WORKER, repo, str(cpus), str(n_docs)],
        capture_output=True, text=True, check=True, cwd=repo,
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["load_before"], r["load_after"] = before, loadavg()
    return r


def main() -> None:
    other = os.path.abspath(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    legs = []
    for i in range(pairs):
        a = leg(REPO, cpus, n_docs)
        b = leg(other, cpus, n_docs)
        legs.append({"pair": i, "this": a, "other": b})
        print(json.dumps(legs[-1]), flush=True)
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "n_docs": n_docs,
        "cpus": cpus,
        "other_repo": other,
        "legs": legs,
        "this_min": min(x["this"]["sec"] for x in legs),
        "other_min": min(x["other"]["sec"] for x in legs),
    }
    with open(os.path.join(HERE, "dedup_ab_runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in ("this_min", "other_min")}))


if __name__ == "__main__":
    main()
