#!/usr/bin/env python
"""PixelCNN masked-conv receptive-field visualiser (parity: the reference's
dev tool src/utils/visual.py:9-87, turned into a runnable script).

For a chosen output pixel, plots |d out / d in| over the input image — the
vertical/horizontal stack masks should light up strictly-causal context.
The same property is asserted in tests/test_causality.py; this script is the
human-eyeball version.

    python tools/visualize_receptive_field.py [--pixel 14 14] [--out rf.png]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pixel", nargs=2, type=int, default=[14, 14])
    parser.add_argument("--size", type=int, default=28)
    parser.add_argument("--hidden", type=int, default=8)
    parser.add_argument("--out", default="receptive_field.png")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from igm_tpu.models.pixelcnn import PixelCNNNet

    net = PixelCNNNet(channels=1, hidden_dim=args.hidden)
    x0 = jnp.zeros((1, args.size, args.size, 1))
    params = net.init(jax.random.PRNGKey(0), x0, None)
    hh, ww = args.pixel

    def out_at(x):
        return net.apply(params, x, None)[0, hh, ww].sum()

    grad = np.abs(np.asarray(jax.grad(out_at)(x0)))[0, :, :, 0]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(grad > 0, cmap="gray_r")
    ax.scatter([ww], [hh], c="red", s=30, label=f"output pixel {hh},{ww}")
    ax.set_title("PixelCNN receptive field (nonzero |grad|)")
    ax.legend()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}; receptive pixels: {(grad > 0).sum()}")


if __name__ == "__main__":
    main()
