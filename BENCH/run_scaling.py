"""Two-cluster-size scaling measurement (BASELINE.json north_rule: >= 0.8
throughput scaling efficiency from N to 4N executors; sandbox proxy =
local[8] vs local[32] on identical input).

Each parallelism level runs in its own subprocess (one JVM per level) on the
same deterministic generated corpus. Writes BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    low = run_level(8, n_docs)
    high = run_level(32, n_docs)

    lines = [
        "# BENCH/BASELINE — throughput & two-level scaling",
        "",
        "Per `BASELINE.json` north_rule, the >=0.8 scaling-efficiency criterion is",
        "evidenced by running the identical job on the identical input at two",
        "parallelism levels: `local[8]` (N) and `local[32]` (4N), one JVM each.",
        f"Input: deterministic generated CC-style corpus, {n_docs:,} docs",
        "(sources/gen.py, seed-stable under any partitioning).",
        "",
        "| stage | local[8] sec | local[32] sec | docs/s @8 | docs/s @32 | speedup | efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    effs = {}
    for stage in low["timings"]:
        t8, t32 = low["timings"][stage], high["timings"][stage]
        sp = t8 / t32
        eff = sp / 4.0
        effs[stage] = eff
        lines.append(
            f"| {stage} | {t8:.2f} | {t32:.2f} | {n_docs / t8:,.0f} | {n_docs / t32:,.0f} "
            f"| {sp:.2f}x | {eff:.2f} |"
        )
    lines += [
        "",
        "efficiency = (T_8 / T_32) / 4 — 1.0 is perfect linear scaling.",
        "",
        "Reference single-thread baseline (BASELINE.md): 77.08 records/s for",
        "WARC scan + HTML strip + fastText langid (single process). The",
        "`extract_langid` row above is the comparable stage.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(low),
        json.dumps(high),
        "```",
    ]
    path = os.path.join(HERE, "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"n_docs": n_docs, "efficiency": effs}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
