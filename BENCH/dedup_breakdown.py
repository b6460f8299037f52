"""Per-phase breakdown of the dedup_minhash stage at two parallelism levels,
with Spark job counts — the Amdahl evidence for WHERE the serial time lives.

Phases (mirroring operators/dedup.dedup_representatives):
  exact     groupBy(text) -> exact-dup edges + distinct-text reps
  signature with_minhash + eager localCheckpoint (1 job: scan+UDF+write)
  lsh_pairs band explode + self-join + agree-filter + localCheckpoint
  cc        connected_components over the union of edge sets
  label     final left join + is_duplicate projection

Per phase: wall time at each level, Spark job count (statusTracker by job
group), and the Amdahl split t = s + p/c solved from the two levels:
  s = (c2*t2 - c1*t1) / (c2 - c1) evaluated with c1=2, c2=8 -> s=(4*t8-t2)/3.

Usage: python BENCH/dedup_breakdown.py [n_docs] — one JVM per level,
strictly serial; writes BENCH/DEDUP_BREAKDOWN.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import __spark_entry__ as entrymod
from chinese_corpus_cleaning_spark.config import DedupConfig
from chinese_corpus_cleaning_spark.operators import dedup
from chinese_corpus_cleaning_spark.sources import gen

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"dedup-breakdown-{cpus}")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
entrymod._ensure_pyfiles(spark)
sc = spark.sparkContext
docs = gen.docs_df(spark, n_docs, partitions=cpus * 4).select(
    F.col("url").alias("doc_id"), "text").cache()
docs.count()
cfg = DedupConfig()
out = {"cpus": cpus, "n_docs": n_docs, "phases": {}}

def timed(name, fn):
    sc.setJobGroup(name, name)
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(name))
    out["phases"][name] = {"sec": round(dt, 3), "jobs": jobs}
    return r

# exact dedup: groups, exact edges, reps (materialized once)
def _exact():
    keyed = docs.select(F.col("doc_id").alias("id"), F.col("text").alias("t"))
    groups = keyed.groupBy("t").agg(F.min("id").alias("rep"))
    exact_edges = (keyed.join(groups, "t").where(F.col("id") != F.col("rep"))
                   .select(F.col("rep").alias("id_a"), F.col("id").alias("id_b"))
                   .localCheckpoint(eager=True))
    reps = groups.select(F.col("rep").alias("id"), F.col("t").alias("text")) \
                 .localCheckpoint(eager=True)
    return exact_edges, reps
exact_edges, reps = timed("exact", _exact)

signed = timed("signature",
               lambda: dedup.with_minhash(reps, cfg, "id", "text")
               .localCheckpoint(eager=True))

def _pairs():
    pairs = dedup.lsh_candidate_pairs(signed, "id", 256)
    sig_a = signed.select(F.col("id").alias("id_a"), F.col("minhash").alias("minhash_a"))
    sig_b = signed.select(F.col("id").alias("id_b"), F.col("minhash").alias("minhash_b"))
    est = (pairs.join(sig_a, "id_a").join(sig_b, "id_b")
           .withColumn("est_jaccard", F.expr(
               "size(filter(zip_with(minhash_a, minhash_b, (x, y) -> x = y), v -> v)) / size(minhash_a)"))
           .where(F.col("est_jaccard") >= cfg.similarity_threshold)
           .select("id_a", "id_b"))
    return est.localCheckpoint(eager=True)
near_edges = timed("lsh_pairs", _pairs)

comp = timed("cc", lambda: dedup.connected_components(
    near_edges.union(exact_edges)).localCheckpoint(eager=True))

timed("label", lambda: docs.select(F.col("doc_id").alias("id"))
      .join(comp, "id", "left")
      .withColumn("component", F.coalesce("comp", "id"))
      .withColumn("is_duplicate", F.col("id") != F.col("component"))
      .agg(F.count(F.lit(1)), F.sum(F.col("is_duplicate").cast("long")))
      .collect())

spark.stop()
print(json.dumps(out))
"""


def run_level(cpus: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cpus), str(n_docs)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    load0 = open("/proc/loadavg").read().split()[:3]
    r2 = run_level(2, n_docs)
    r8 = run_level(8, n_docs)
    load1 = open("/proc/loadavg").read().split()[:3]

    lines = [
        "# Dedup stage breakdown (Amdahl evidence)",
        "",
        f"{n_docs:,} docs, local[2] vs local[8], one JVM per level, serial.",
        f"/proc/loadavg before: {' '.join(load0)}, after: {' '.join(load1)}",
        "(external load > ~2 contaminates — see BASELINE.md measurement notes).",
        "",
        "| phase | t@2 (s) | jobs@2 | t@8 (s) | jobs@8 | eff 2->8 | serial s (Amdahl) | s/t@8 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    tot2 = tot8 = 0.0
    for ph in r2["phases"]:
        t2, t8 = r2["phases"][ph]["sec"], r8["phases"][ph]["sec"]
        j2, j8 = r2["phases"][ph]["jobs"], r8["phases"][ph]["jobs"]
        tot2 += t2
        tot8 += t8
        s = max((4 * t8 - t2) / 3, 0.0)
        eff = (t2 / t8) / 4 if t8 else float("nan")
        lines.append(
            f"| {ph} | {t2:.2f} | {j2} | {t8:.2f} | {j8} | {eff:.2f} "
            f"| {s:.2f} | {s / t8:.0%} |"
        )
    s_tot = max((4 * tot8 - tot2) / 3, 0.0)
    lines += [
        f"| **total** | {tot2:.2f} | | {tot8:.2f} | | {(tot2 / tot8) / 4:.2f} "
        f"| {s_tot:.2f} | {s_tot / tot8:.0%} |",
        "",
        "serial s solved from t = s + p/c at c=2,8: s = (4*t8 - t2)/3;",
        "s/t@8 = fraction of the 8-core wall time that does not parallelize",
        "at this input size (job scheduling, driver CC, broadcast setup,",
        "Python worker fan-out). p grows with corpus size while s stays",
        "~constant, so measured efficiency at a fixed 400k docs is a LOWER",
        "bound on efficiency at the 10^12-doc target.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r2),
        json.dumps(r8),
        "```",
    ]
    path = os.path.join(HERE, "DEDUP_BREAKDOWN.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"t2": tot2, "t8": tot8, "eff": (tot2 / tot8) / 4}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
