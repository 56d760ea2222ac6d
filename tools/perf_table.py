#!/usr/bin/env python
"""Render benchmarks/results_round3*.json as the README markdown table.

Round 3 made dispatch-chained execution the DEFAULT training path
(trainer.steps_per_execution=auto, core/trainer.py resolve_chain_k), so
the headline per-family numbers are the chained sweep
(results_round3.json, K=8); the single-dispatch column is kept for the
AR families whose wall docs (docs/MFU_AR.md) discuss it
(results_round3_ar_single.json).

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
    chained = load_rows(BENCH / "results_round3.json")
    single = load_rows(BENCH / "results_round3_ar_single.json")

    print("| family | batch | steps/s (K=8 chained) | imgs/s | "
          "single-dispatch steps/s | GFLOPs/step | TF/s |")
    print("|---|---|---|---|---|---|---|")
    for fam, row in chained.items():
        sg = single.get(fam, {})
        sg_txt = (f"{sg['steps_per_sec']:.0f}" if sg else "—")
        print(f"| {fam} | {row['batch']} | {row['steps_per_sec']:.0f} "
              f"| {row['imgs_per_sec']:,.0f} "
              f"| {sg_txt} "
              f"| {row.get('flops_per_step_g', 0):.1f} "
              f"| {row.get('achieved_tflops', 0):.1f} |")


if __name__ == "__main__":
    main()
