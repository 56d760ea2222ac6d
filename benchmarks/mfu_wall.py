#!/usr/bin/env python
"""Analytic roofline for the flagship DDPM CIFAR-10 train step (MFU wall).

Measured (bench.py, hard device_get fence, TPU v5 lite): 43.7 steps/s at
batch 256 = 53.2 achieved TFLOP/s = 27% of the 197 TF/s bf16 peak.  This
script explains where the other 73% is: it walks every conv / norm /
attention op in the UNet (dim=64, mults [1,2,4], 32x32x3), assigns each a
compute time under a REALISTIC MXU utilisation model (systolic array tiles
are 128x128 — a conv whose reduction dim Cin*k^2 or output dim Cout is
below 128 cannot fill the array) and a memory time from minimal HBM
traffic, and takes per-op max(compute, memory) as the speed-of-light.

    python benchmarks/mfu_wall.py [--batch 256] [--dim 64]

Output: per-stage table + bottom line "SoL step time vs measured", i.e.
how much of the gap is PHYSICS (small channel counts / memory-bound
normalisation at 32x32) vs schedule/fusion headroom.
"""
from __future__ import annotations

import argparse
from math import ceil

PEAK_TFLOPS = 197e12      # v5e bf16
HBM_BW = 819e9            # v5e bytes/s
BF16 = 2                  # bytes per activation element

ROWS = []


def ceil_to(x: int, k: int) -> int:
    return ceil(x / k) * k


def conv(name, b, h, w, cin, cout, k=3, stride=1, bwd=True):
    """Conv as implicit GEMM: M=B*H'*W', K=cin*k^2, N=cout."""
    ho, wo = h // stride, w // stride
    m, kk, n = b * ho * wo, cin * k * k, cout
    flops = 2.0 * m * kk * n
    # forward + dgrad + wgrad (each ~= forward GEMM cost)
    total_flops = flops * (3.0 if bwd else 1.0)
    # MXU fill: K and N pad to 128 lanes; M is huge (fine)
    util = (kk / ceil_to(kk, 128)) * (n / ceil_to(n, 128))
    t_compute = total_flops / (PEAK_TFLOPS * util)
    # minimal traffic: read in, write out (x3 for bwd passes), weights tiny
    bytes_ = BF16 * (b * h * w * cin + b * ho * wo * cout) * (3.0 if bwd else 1.0)
    t_mem = bytes_ / HBM_BW
    ROWS.append((name, total_flops, util, t_compute, t_mem))


def elementwise(name, elems, passes=2, bwd=True, dtype_bytes=BF16):
    """Norm/act/add: `passes` read+write sweeps over the activation."""
    bytes_ = dtype_bytes * elems * 2 * passes * (2.0 if bwd else 1.0)
    ROWS.append((name, 0.0, 1.0, 0.0, bytes_ / HBM_BW))


def attn(name, b, hw, heads, d, dim, bwd=True):
    # qkv 1x1 conv + out 1x1 conv
    conv(f"{name}.qkv", b, int(hw ** 0.5), int(hw ** 0.5), dim, 3 * heads * d,
         k=1, bwd=bwd)
    conv(f"{name}.out", b, int(hw ** 0.5), int(hw ** 0.5), heads * d, dim,
         k=1, bwd=bwd)
    # linear attention einsums: context k^T v (hw x d x d) + out q @ ctx
    flops = 2.0 * b * heads * hw * d * d * 2 * (3.0 if bwd else 1.0)
    util = d / 128.0  # d=32 reduction: quarter-filled MXU
    ROWS.append((f"{name}.einsum", flops, util, flops / (PEAK_TFLOPS * util),
                 BF16 * b * heads * hw * d * 6 / HBM_BW))


def resnet_block(name, b, h, w, cin, cout):
    conv(f"{name}.conv1", b, h, w, cin, cout)
    elementwise(f"{name}.gn_mish1", b * h * w * cout, passes=2)
    conv(f"{name}.conv2", b, h, w, cout, cout)
    elementwise(f"{name}.gn_mish2+film", b * h * w * cout, passes=2.5)
    if cin != cout:
        conv(f"{name}.skip1x1", b, h, w, cin, cout, k=1)
    elementwise(f"{name}.residual_add", b * h * w * cout, passes=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--measured-steps-per-sec", type=float, default=43.7)
    args = ap.parse_args()
    b, d = args.batch, args.dim
    mults = [1, 2, 4]
    dims = [3] + [d * m for m in mults]          # [3, 64, 128, 256]
    sizes = [32, 16, 8]

    # -------- down path
    h = 32
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        resnet_block(f"down{i}.rb1", b, h, h, cin if i == 0 else dims[i], cout)
        resnet_block(f"down{i}.rb2", b, h, h, cout, cout)
        attn(f"down{i}.attn", b, h * h, 4, 32, cout)
        if i < len(mults) - 1:
            conv(f"down{i}.downsample", b, h, h, cout, cout, stride=2)
            h //= 2
    # -------- middle (8x8x256)
    mid = dims[-1]
    resnet_block("mid.rb1", b, h, h, mid, mid)
    attn("mid.attn", b, h * h, 4, 32, mid)
    resnet_block("mid.rb2", b, h, h, mid, mid)
    # -------- up path
    ups = list(reversed(list(zip(dims[1:-1], dims[2:]))))  # [(128,256),(64,128)]
    for j, (din, dout) in enumerate(ups):
        resnet_block(f"up{j}.rb1", b, h, h, dout * 2, din)
        resnet_block(f"up{j}.rb2", b, h, h, din, din)
        attn(f"up{j}.attn", b, h * h, 4, 32, din)
        conv(f"up{j}.upsampleT", b, h * 2, h * 2, din, din, k=4)
        h *= 2
    # -------- head + diffusion glue
    conv("head.block", b, 32, 32, dims[1], dims[1])
    elementwise("head.gn_mish", b * 32 * 32 * dims[1], passes=2)
    conv("head.out1x1", b, 32, 32, dims[1], 3, k=1)
    elementwise("diffusion.q_sample+loss", b * 32 * 32 * 3, passes=4,
                dtype_bytes=4)
    n_params = 7.6e6
    elementwise("adam.update", n_params, passes=4, bwd=False, dtype_bytes=4)

    tot_flops = sum(r[1] for r in ROWS)
    t_comp = sum(r[3] for r in ROWS)
    t_mem = sum(r[4] for r in ROWS)
    t_sol = sum(max(r[3], r[4]) for r in ROWS)

    groups = {}
    for name, fl, util, tc, tm in ROWS:
        key = name.split(".")[0]
        g = groups.setdefault(key, [0.0, 0.0, 0.0])
        g[0] += fl
        g[1] += max(tc, tm)
        g[2] += tc
    print(f"{'stage':<10} {'GFLOPs':>9} {'SoL ms':>8} {'compute ms':>10}")
    for key, (fl, t, tc) in groups.items():
        print(f"{key:<10} {fl / 1e9:9.1f} {t * 1e3:8.3f} {tc * 1e3:10.3f}")

    measured_ms = 1e3 / args.measured_steps_per_sec
    print("-" * 42)
    print(f"total model FLOPs/step : {tot_flops / 1e9:.1f} G")
    print(f"pure-compute time      : {t_comp * 1e3:.2f} ms "
          f"(util-weighted; {tot_flops / t_comp / 1e12:.0f} TF/s)")
    print(f"pure-memory time       : {t_mem * 1e3:.2f} ms")
    print(f"speed-of-light step    : {t_sol * 1e3:.2f} ms "
          f"({1.0 / t_sol:.1f} steps/s)")
    print(f"measured step          : {measured_ms:.2f} ms "
          f"({args.measured_steps_per_sec:.1f} steps/s)")
    print(f"schedule/fusion gap    : {measured_ms / (t_sol * 1e3):.2f}x SoL")
    print(f"MFU at SoL             : "
          f"{tot_flops / t_sol / PEAK_TFLOPS * 100:.1f}% "
          f"(i.e. the architecture's own ceiling on this chip)")


if __name__ == "__main__":
    main()
