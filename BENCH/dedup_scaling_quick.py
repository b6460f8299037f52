"""Short dedup-only 2->8 scaling probe (~6-8 min) for catching quiet host
windows that the full 3-level harness (~20 min) keeps missing. Measures the
north-rule-relevant pairing only and records /proc/loadavg around each leg
so a reading can be accepted or rejected on evidence.

Usage: python BENCH/dedup_scaling_quick.py [n_docs]; appends one JSON line
to BENCH/dedup_quick_runs.jsonl.
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
sys.path.insert(0, %(repo)r)
cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import __spark_entry__ as entrymod
from chinese_corpus_cleaning_spark.operators import dedup
from chinese_corpus_cleaning_spark.sources import gen
# IDENTICAL job at every level (round-4 fix): shuffle partitions and input
# partitioning are fixed, not derived from the core count — a real cluster
# keeps the same partitioning when executors are added, and deriving them
# from `cpus` made the two legs run DIFFERENT physical plans (the
# low-partition legs spill-bind on the shared disk, distorting the ratio).
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
entrymod._ensure_pyfiles(spark)
docs = gen.docs_df(spark, n_docs, partitions=64).select(
    F.col("url").alias("doc_id"), "text").cache()
docs.count()
# warm python workers / Arrow so interpreter spawn isn't in the timed region
dedup.with_minhash(docs.limit(64)).agg(F.count(F.lit(1))).collect()
t0 = time.perf_counter()
dedup.dedup_representatives(docs).agg(
    F.count(F.lit(1)), F.sum(F.col("is_duplicate").cast("long"))).collect()
dt = time.perf_counter() - t0
spark.stop()
print(json.dumps({"cpus": cpus, "sec": round(dt, 3)}))
"""


def loadavg() -> list[float]:
    return [float(x) for x in open("/proc/loadavg").read().split()[:3]]


def cpu_jiffies() -> tuple[int, int]:
    """(busy, total) jiffies across all cpus from /proc/stat line 1."""
    f = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    idle = f[3] + f[4]  # idle + iowait
    return sum(f) - idle, sum(f)


def disk_bytes() -> tuple[int, int]:
    """(read, written) bytes summed over physical disks (sectors x 512)."""
    rd = wr = 0
    for ln in open("/proc/diskstats"):
        p = ln.split()
        # field 3 is device name; skip partitions/loop/ram
        if p[2].startswith(("loop", "ram")) or p[2][-1].isdigit():
            continue
        rd += int(p[5]) * 512
        wr += int(p[9]) * 512
    return rd, wr


def run_level(cpus: int, n_docs: int) -> dict:
    before = loadavg()
    j0, t0 = cpu_jiffies()
    r0, w0 = disk_bytes()
    wall0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cpus), str(n_docs)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    wall = time.perf_counter() - wall0
    j1, t1 = cpu_jiffies()
    r1, w1 = disk_bytes()
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["load_before"] = before
    r["load_after"] = loadavg()
    # whole-box CPU utilization of this leg's window, in units of cores:
    # bandwidth-bound legs show busy_cores << cpus while CPU-bound legs
    # pin busy_cores ~= cpus (+ python workers)
    if t1 > t0:
        r["busy_cores"] = round(32 * (j1 - j0) / (t1 - t0), 2)
    r["io_read_gb"] = round((r1 - r0) / 1e9, 2)
    r["io_write_gb"] = round((w1 - w0) / 1e9, 2)
    r["io_write_mb_s"] = round((w1 - w0) / 1e6 / wall, 1)
    return r


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    r2 = run_level(2, n_docs)
    r8 = run_level(8, n_docs)
    eff = (r2["sec"] / r8["sec"]) / 4
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "n_docs": n_docs,
        "t2": r2["sec"],
        "t8": r8["sec"],
        "eff_2_8": round(eff, 3),
        "load": {"leg2": [r2["load_before"], r2["load_after"]],
                 "leg8": [r8["load_before"], r8["load_after"]]},
        "util": {
            lvl: {
                k: r[k]
                for k in ("busy_cores", "io_read_gb", "io_write_gb", "io_write_mb_s")
                if k in r
            }
            for lvl, r in (("leg2", r2), ("leg8", r8))
        },
    }
    with open(os.path.join(HERE, "dedup_quick_runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
