"""Two-cluster-size scaling measurement (BASELINE.json north_rule: >= 0.8
throughput scaling efficiency from N to 4N executors).

Sandbox proxy: the identical job on the identical input at local[2], local[8]
and local[32], one JVM per level, strictly serial. Two N->4N readings:

  * 2 -> 8:  the clean reading. Both legs leave spare physical cores for the
    Python UDF workers and the JVM's own scan/shuffle threads, matching a
    real cluster where each executor's cores are provisioned for both.
  * 8 -> 32: the machine-saturated reading. local[32] on a 32-core box runs
    32 JVM task threads PLUS 32 Python workers on 32 hardware threads —
    2x oversubscribed — so it understates true 4N scaling; reported for
    completeness.

Writes BENCH/BASELINE.md. Usage: python BENCH/run_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

LEVELS = (2, 8, 32)


def run_level(cpus: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scale_worker.py"), str(cpus), str(n_docs)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    results = {c: run_level(c, n_docs) for c in LEVELS}

    lines = [
        "# BENCH/BASELINE — throughput & two-level scaling",
        "",
        "Per `BASELINE.json` north_rule (>=0.8 throughput scaling efficiency from",
        "N to 4N executors), the identical job runs on the identical input at",
        "local[2], local[8] and local[32] — one JVM per level, strictly serial.",
        f"Input: deterministic generated CC-style corpus, {n_docs:,} docs",
        "(sources/gen.py, seed-stable under any partitioning).",
        "",
        "**2 -> 8 cores is the clean N -> 4N proxy**: both legs leave spare",
        "physical cores for Python UDF workers + JVM scan/shuffle threads, as a",
        "real cluster would. 8 -> 32 saturates the 32-core box (32 JVM task",
        "threads + 32 Python workers = 2x oversubscription), so it understates",
        "scaling and is reported for completeness.",
        "",
        "| stage | t@2 | t@8 | t@32 | docs/s @2 | docs/s @8 | docs/s @32 "
        "| eff 2->8 | eff 8->32 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    effs = {}
    for stage in results[2]["timings"]:
        t2 = results[2]["timings"][stage]
        t8 = results[8]["timings"][stage]
        t32 = results[32]["timings"][stage]
        e28 = (t2 / t8) / 4.0
        e832 = (t8 / t32) / 4.0
        effs[stage] = {"eff_2_8": round(e28, 3), "eff_8_32": round(e832, 3)}
        lines.append(
            f"| {stage} | {t2:.2f} | {t8:.2f} | {t32:.2f} "
            f"| {n_docs / t2:,.0f} | {n_docs / t8:,.0f} | {n_docs / t32:,.0f} "
            f"| {e28:.2f} | {e832:.2f} |"
        )
    lines += [
        "",
        "efficiency = (T_N / T_4N) / 4 — 1.0 is perfect linear scaling.",
        "",
        "NOTE on the dedup ratio at this input size: the round-5 candidate",
        "cut (bucket cap 64 + star rescue) removed most of the parallel join",
        "work, which LOWERS the fixed-N 2->8 ratio while lowering wall at",
        "every level — the efficiency-ratio trap documented in the round-3",
        "notes. The scale-representative reading is the 1.6M-doc clean-window",
        "A/B in the round-5 measurement notes below: eff 2->8 = 0.700 with",
        "this same production config, walls 1.67x/1.73x below the round-4",
        "code at local[2]/local[8].",
        "",
        "Reference single-thread baseline (BASELINE.md): 77.08 records/s for",
        "WARC scan + HTML strip + fastText langid (single process, real CC",
        "pages). The `extract_langid` stage above is the comparable shape.",
        "",
        "Raw JSON:",
        "```json",
        *(json.dumps(results[c]) for c in LEVELS),
        "```",
    ]
    path = os.path.join(HERE, "BASELINE.md")
    # preserve the accumulated per-round measurement notes: only the header
    # + tables section (everything before the first "## Measurement notes")
    # is regenerated
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        marker = "## Measurement notes"
        if marker not in old:
            raise SystemExit(
                f"{path} exists but lacks the '{marker}' heading — refusing "
                "to overwrite (regeneration would silently drop the "
                "accumulated per-round measurement notes; restore the "
                "marker or delete the file first)"
            )
        tail = "\n" + old[old.index(marker) :]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(json.dumps({"n_docs": n_docs, "efficiency": effs}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
