"""Two-parallelism scaling study (the north_rule's N vs 4N evidence).

Runs the full ER pipeline at local[8] and local[32] (sandbox stand-ins for
N and 4N executors) in fresh processes on the SAME deterministic input,
records turns/sec at both, computes efficiency = (tput_32 / tput_8) / 4,
and writes BENCH/BASELINE.md.

Usage: python scripts/scaling_report.py [--er-conv 80000]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(master: str, er_conv: int) -> dict:
    cmd = [
        sys.executable,
        str(REPO / "bench.py"),
        "--er-only",
        "--master",
        master,
        "--er-conv",
        str(er_conv),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=REPO)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--er-conv", type=int, default=80_000)
    args = p.parse_args()

    r8 = run_bench("local[8]", args.er_conv)
    r32 = run_bench("local[32]", args.er_conv)
    t8 = r8["er"]["turns_per_sec"]
    t32 = r32["er"]["turns_per_sec"]
    eff = (t32 / t8) / 4.0

    md = f"""# BENCH/BASELINE — scaling evidence (N vs 4N parallelism)

The north_rule requires throughput scaling efficiency >= 0.8 between N and
4N executors. In this sandbox (single host, no cluster) the same ER job runs
at `local[8]` and `local[32]` on the SAME deterministic input
({r8['er']['turns']} transcript turns, {r8['er']['mentions']} linked mentions).

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[8]  (N)  | {r8['er']['sec']} | {t8} |
| local[32] (4N) | {r32['er']['sec']} | {t32} |

**Scaling efficiency = (tput_4N / tput_N) / 4 = ({t32} / {t8}) / 4 =
{eff:.3f}** {'(PASS >= 0.8)' if eff >= 0.8 else '(FAIL < 0.8)'}

Pipeline under test: normalize -> span explode -> broadcast alias-dict join
-> contextual ranking -> per-turn segmentation DP (mapInPandas) ->
representative dedup -> MinHash-LSH + entity blocking (salt-capped) ->
sort-merge pair self-join -> vectorized pairwise scoring -> iterative
connected components -> cluster fan-out broadcast join.

Determinism: the corpus generator is counter-based (splitmix64 of row id),
so both runs see byte-identical input regardless of partitioning.

Raw bench lines:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(md)
    print(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
