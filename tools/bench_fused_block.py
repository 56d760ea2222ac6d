#!/usr/bin/env python
"""Fused conv3x3+GN+Mish Pallas kernel vs XLA, at the flagship DDPM shapes.

Measures the FORWARD of the UNet Block unit (networks/unet.py Block; the
round-2 verdict's suggested fusion shape) at the three resolutions of the
CIFAR-10 flagship (batch 256, hidden 64, mults [1,2,4]) in bf16.

    python tools/bench_fused_block.py [--iters 50] [--batch 256]

Prints one JSON line per (shape, variant).  Kernel-vs-XLA dispatch in this
framework is decided by measurement; the verdict lands in PARITY.md.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--nb", type=int, default=8)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from igm_tpu.ops.pallas_fused_block import fused_block_fwd, xla_block_fwd

    shapes = [  # flagship levels: (H, W, Cin, Cout)
        (32, 32, 64, 64),
        (16, 16, 128, 128),
        (8, 8, 256, 256),
    ]
    rng = np.random.default_rng(0)
    for (h, w, ci, co) in shapes:
        x = jnp.asarray(rng.normal(size=(args.batch, h, w, ci)), jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(co,)) * 0.1, jnp.float32)
        sc = jnp.asarray(1 + rng.normal(size=(co,)) * 0.1, jnp.float32)
        bi = jnp.asarray(rng.normal(size=(co,)) * 0.1, jnp.float32)

        # Time a jitted DEPTH-fold composition (Cin == Cout at every
        # flagship level): one dispatch covers DEPTH applications, so the
        # ~2.5 ms tunnel dispatch and the host fence cost amortise away.
        DEPTH = 20

        @jax.jit
        def xla_n(x, wt, b, sc, bi):
            for _ in range(DEPTH):
                x = xla_block_fwd(x, wt, b, sc, bi)
            return x

        @jax.jit
        def pallas_n(x, wt, b, sc, bi):
            for _ in range(DEPTH):
                x = fused_block_fwd(x, wt, b, sc, bi, nb=args.nb)
            return x

        variants = {"xla": xla_n, "pallas": pallas_n}
        outs = {}
        for name, fn in variants.items():
            try:
                out = fn(x, wt, b, sc, bi)
                out.block_until_ready()
                # pre-compile the host-fence convert program too
                _ = float(jnp.asarray(out, jnp.float32).ravel()[0])
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(x, wt, b, sc, bi)
                out.block_until_ready()
                _ = float(jnp.asarray(out, jnp.float32).ravel()[0])
                dt = (time.perf_counter() - t0) / (args.iters * DEPTH)
                outs[name] = out
                print(json.dumps({
                    "shape": f"{args.batch}x{h}x{w}x{ci}->{co}",
                    "variant": name, "ms": round(dt * 1e3, 4)}))
            except Exception as exc:
                print(json.dumps({
                    "shape": f"{args.batch}x{h}x{w}x{ci}->{co}",
                    "variant": name, "error": str(exc)[:300]}))
        if len(outs) == 2:
            d = float(jnp.abs(outs["xla"].astype(jnp.float32)
                              - outs["pallas"].astype(jnp.float32)).max())
            print(json.dumps({"shape": f"{args.batch}x{h}x{w}x{ci}->{co}",
                              "max_abs_diff": d}))


if __name__ == "__main__":
    main()
