#!/usr/bin/env python
"""Archive a training run's evidence: TB scalar curves -> JSON + final
sample grid, into benchmarks/real_runs/<name>/.

    python tools/archive_run.py <run_dir> <name> [--out benchmarks/real_runs]

<run_dir> is a hydra-style run directory (contains tensorboard/ and
results/).  Keeps the repo evidence small: full scalar curves as JSON (not
event files), plus the last sample grid jpg.
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def read_scalars(tb_dir: Path) -> dict:
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    ea = EventAccumulator(str(tb_dir))
    ea.Reload()
    out = {}
    for tag in ea.Tags()["scalars"]:
        out[tag] = [[s.step, round(float(s.value), 6)]
                    for s in ea.Scalars(tag)]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("name")
    ap.add_argument("--out", default=str(REPO / "benchmarks" / "real_runs"))
    args = ap.parse_args()

    run = Path(args.run_dir)
    dest = Path(args.out) / args.name
    dest.mkdir(parents=True, exist_ok=True)

    curves = read_scalars(run / "tensorboard")
    (dest / "curves.json").write_text(json.dumps(curves, indent=0))

    results = run / "results"
    if results.exists():
        grids = sorted(results.glob("*.jpg"),
                       key=lambda p: int(p.stem) if p.stem.isdigit() else -1)
        if grids:
            shutil.copy(grids[-1], dest / f"samples_epoch{grids[-1].stem}.jpg")

    summary = {tag: {"first": pts[0], "last": pts[-1]}
               for tag, pts in curves.items() if pts}
    (dest / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps({"archived": str(dest),
                      "tags": list(curves), "grids": results.exists()}))


if __name__ == "__main__":
    main()
