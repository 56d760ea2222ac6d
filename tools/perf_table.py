#!/usr/bin/env python
"""Render benchmarks/results_round2*.json as the README markdown table.

    python tools/perf_table.py
"""
from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BENCH = REPO / "benchmarks"


def load_rows(path: Path) -> dict:
    if not path.exists():
        return {}
    data = json.loads(path.read_text())
    return {r["family"]: r for r in data["rows"] if "error" not in r}


def main() -> None:
    plain = load_rows(BENCH / "results_round2.json")
    plain.update(load_rows(BENCH / "results_round2_stragglers.json"))
    chained = load_rows(BENCH / "results_round2_chained.json")

    print("| family | batch | steps/s | imgs/s | chained K=8 steps/s | "
          "GFLOPs/step | TF/s (chained) |")
    print("|---|---|---|---|---|---|---|")
    for fam, row in plain.items():
        ch = chained.get(fam, {})
        print(f"| {fam} | {row['batch']} | {row['steps_per_sec']:.0f} "
              f"| {row['imgs_per_sec']:,.0f} "
              f"| {ch.get('steps_per_sec', float('nan')):.0f} "
              f"| {row.get('flops_per_step_g', 0):.1f} "
              f"| {ch.get('achieved_tflops', row.get('achieved_tflops', 0)):.1f} |")

    missing = set(plain) ^ set(chained)
    if missing:
        print(f"\n<!-- families missing from one sweep: {sorted(missing)} -->")


if __name__ == "__main__":
    main()
