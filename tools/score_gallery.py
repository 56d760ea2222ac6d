#!/usr/bin/env python
"""Score the archived real-run sample grids with the offline digit scorer.

    python tools/score_gallery.py [--runs-dir benchmarks/real_runs]

For every ``benchmarks/real_runs/<family>/samples*.jpg`` grid, parses the
tiles back out (make_grid layout: padding 2), scores them with the
deterministic digit classifier (igm_tpu/utils/digit_score.py — the offline
analog of the reference's Inception FID, `src/callbacks/evaluation.py:8-30`),
and writes ``digit_scores.json`` per family plus a summary table.

Only MNIST-geometry (28x28) grids are scored; CIFAR/CelebA/dSprites
families are skipped (the classifier is a digit classifier).
"""
from __future__ import annotations

import argparse
import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def untile(path: str, h: int, w: int, pad: int = 2):
    import numpy as np
    from PIL import Image

    g = np.asarray(Image.open(path).convert("L")).astype("float32")
    g = g / 127.5 - 1.0
    rows = (g.shape[0] - pad) // (h + pad)
    cols = (g.shape[1] - pad) // (w + pad)
    tiles = []
    for r in range(rows):
        for c in range(cols):
            y, x = pad + r * (h + pad), pad + c * (w + pad)
            tiles.append(g[y:y + h, x:x + w])
    return np.stack(tiles)[..., None]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-dir", default=str(REPO / "benchmarks/real_runs"))
    ap.add_argument("--size", type=int, default=28)
    args = ap.parse_args()

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from igm_tpu.utils.digit_score import load_or_train, score_samples

    params = load_or_train(str(REPO / "data"), args.size, args.size)
    table = {}
    for fam_dir in sorted(Path(args.runs_dir).iterdir()):
        grids = sorted(glob.glob(str(fam_dir / "samples*.jpg")))
        if not grids:
            continue
        from PIL import Image
        gw, gh = Image.open(grids[-1]).size
        if (gw - 2) % (args.size + 2) or (gh - 2) % (args.size + 2):
            continue  # other geometry (handled by another --size run)
        # score EVERY grid (round 4: ddpm_cifar carries DDIM-50 and DPM-20
        # grids from the same weights — per-grid scores back the
        # "same quality class" claim with a metric)
        per_grid = {}
        for g in grids:
            s = score_samples(params, untile(g, args.size, args.size))
            s["grid"] = Path(g).name
            per_grid[Path(g).name] = s
        out = dict(per_grid[Path(grids[-1]).name])  # back-compat top level
        if len(per_grid) > 1:
            out["grids"] = per_grid
        (fam_dir / "digit_scores.json").write_text(json.dumps(out, indent=1))
        table[fam_dir.name] = out
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
