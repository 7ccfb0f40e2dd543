"""Merge the two per-level scale_new_ops JSONs (written by
``scale_new_ops.py --cores N``) into the operator-scaling table appended
to BENCH/BASELINE.md.

    python scripts/scale_report.py /tmp/scale8.json /tmp/scale32.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    lo = json.loads(open(lo_path).read().strip().splitlines()[-1])
    hi = json.loads(open(hi_path).read().strip().splitlines()[-1])
    n_lo, n_hi = lo["cores"], hi["cores"]
    rows = []
    for op, r8 in lo["ops"].items():
        r32 = hi["ops"].get(op, {})
        t8, t32 = r8.get("sec"), r32.get("sec")
        if t8 is None or t32 is None:
            rows.append(f"| {op} | {r8.get('input', '')} | ERR | ERR | — | — |")
            continue
        eff = round((t8 / t32) / (n_hi / n_lo), 3) if t32 else None
        rps = f"{int(r32['rows'] / t32):,}" if t32 else "—"
        rows.append(
            f"| {op} | {r8['input']} | {t8} | {t32} | {eff} | {rps} |"
        )
    table = "\n".join(rows)
    block = f"""

## New-operator N -> 4N scaling (deterministic synthetic inputs, fresh JVMs)

Same job at local[{n_lo}] and local[{n_hi}] on identical inputs
(scripts/scale_new_ops.py; shuffle partitions held at 64 for both levels
— sized for the data, not the cores). loadavg_1m at report time:
{lo['loadavg_1m']} (local[{n_lo}] level) / {hi['loadavg_1m']} (local[{n_hi}] level).
eff = (t_{n_lo} / t_{n_hi}) / {n_hi // n_lo}; ops measured in seconds of wall clock
including all shuffles and actions. Sub-second ops are overhead-bound at
this corpus size and their eff column is not meaningful (the Amdahl
fixed-term analysis in the headline section applies).

| operator | input | sec @local[{n_lo}] | sec @local[{n_hi}] | eff | rows/s @local[{n_hi}] |
|---|---|---|---|---|---|
{table}
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(block)
    print(f"appended operator table to {path}")


if __name__ == "__main__":
    main()
