#!/usr/bin/env python
"""Measured torch baseline: the reference's DDPM train step, on this host.

The reference (PyTorch-Lightning, `src/models/ddpm.py`) publishes no
throughput numbers and no GPU exists in this image, so the only *measured*
baseline available is torch-CPU on the same host that runs our JAX-CPU
step.  This file is OUR OWN torch implementation of the reference's
architecture semantics (UNet dim=64 mults [1,2,4] @ 32x32x3, GroupNorm(8)+
Mish blocks, time-FiLM ResnetBlocks, pre-normed linear attention, cosine
q_sample + l1 eps loss, Adam) — written fresh, not copied; it exists purely
to be timed.

Usage:  python benchmarks/torch_ref_ddpm.py [--batch 32] [--iters 5]
Prints one JSON line {"torch_cpu_imgs_per_sec": ...}.

Companion: the same step in our framework on the same CPU
(IGM_PLATFORM=cpu python bench.py) gives the same-host JAX/XLA number;
the ratio is hardware-independent evidence for BASELINE.md's throughput
target.  See benchmarks/BASELINE_DERIVATION.md.
"""
from __future__ import annotations

import argparse
import json
import math
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class Mish(nn.Module):
    def forward(self, x):
        return x * torch.tanh(F.softplus(x))


class SinusoidalPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, t):
        half = self.dim // 2
        freq = torch.exp(torch.arange(half, dtype=torch.float32)
                         * -(math.log(10000.0) / (half - 1)))
        args = t.float()[:, None] * freq[None, :]
        return torch.cat([args.sin(), args.cos()], dim=-1)


class ChannelLayerNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.g = nn.Parameter(torch.ones(1, dim, 1, 1))
        self.b = nn.Parameter(torch.zeros(1, dim, 1, 1))
        self.eps = eps

    def forward(self, x):
        std = x.std(dim=1, unbiased=False, keepdim=True)
        mean = x.mean(dim=1, keepdim=True)
        return (x - mean) / (std + self.eps) * self.g + self.b


class LinearAttention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        hidden = heads * dim_head
        self.to_qkv = nn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x).reshape(b, self.heads, 3 * self.dim_head, h * w)
        q, k, v = qkv.chunk(3, dim=2)
        k = k.softmax(dim=-1)
        context = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhde,bhdn->bhen", context, q)
        return self.to_out(out.reshape(b, -1, h, w))


class Block(nn.Module):
    def __init__(self, dim, dim_out, groups=8):
        super().__init__()
        self.net = nn.Sequential(nn.Conv2d(dim, dim_out, 3, padding=1),
                                 nn.GroupNorm(groups, dim_out), Mish())

    def forward(self, x):
        return self.net(x)


class ResnetBlock(nn.Module):
    def __init__(self, dim, dim_out, time_dim):
        super().__init__()
        self.mlp = nn.Sequential(Mish(), nn.Linear(time_dim, dim_out))
        self.block1 = Block(dim, dim_out)
        self.block2 = Block(dim_out, dim_out)
        self.res = nn.Conv2d(dim, dim_out, 1) if dim != dim_out else nn.Identity()

    def forward(self, x, t):
        h = self.block1(x)
        h = h + self.mlp(t)[:, :, None, None]
        return self.block2(h) + self.res(x)


class AttnBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = ChannelLayerNorm(dim)
        self.attn = LinearAttention(dim)

    def forward(self, x):
        return x + self.attn(self.norm(x))


class Unet(nn.Module):
    def __init__(self, dim=64, dim_mults=(1, 2, 4), channels=3):
        super().__init__()
        dims = [channels] + [dim * m for m in dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        tdim = dim
        self.time_mlp = nn.Sequential(SinusoidalPosEmb(dim),
                                      nn.Linear(dim, dim * 4), Mish(),
                                      nn.Linear(dim * 4, dim))
        self.downs, self.ups = nn.ModuleList(), nn.ModuleList()
        for ind, (din, dout) in enumerate(in_out):
            last = ind >= len(in_out) - 1
            self.downs.append(nn.ModuleList([
                ResnetBlock(din, dout, tdim), ResnetBlock(dout, dout, tdim),
                AttnBlock(dout),
                nn.Conv2d(dout, dout, 3, 2, 1) if not last else nn.Identity()]))
        mid = dims[-1]
        self.mid1 = ResnetBlock(mid, mid, tdim)
        self.mid_attn = AttnBlock(mid)
        self.mid2 = ResnetBlock(mid, mid, tdim)
        for din, dout in reversed(in_out[1:]):
            self.ups.append(nn.ModuleList([
                ResnetBlock(dout * 2, din, tdim), ResnetBlock(din, din, tdim),
                AttnBlock(din), nn.ConvTranspose2d(din, din, 4, 2, 1)]))
        self.final = nn.Sequential(Block(dims[1], dims[1]),
                                   nn.Conv2d(dims[1], channels, 1))

    def forward(self, x, time):
        t = self.time_mlp(time)
        skips = []
        for rb1, rb2, attn, down in self.downs:
            x = rb2(rb1(x, t), t)
            x = attn(x)
            skips.append(x)
            x = down(x)
        x = self.mid2(self.mid_attn(self.mid1(x, t)), t)
        for rb1, rb2, attn, up in self.ups:
            x = torch.cat([x, skips.pop()], dim=1)
            x = rb2(rb1(x, t), t)
            x = up(attn(x))
        return self.final(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--timesteps", type=int, default=1000)
    args = ap.parse_args()

    torch.manual_seed(0)
    net = Unet()
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)

    # cosine betas -> sqrt-alpha-bar tables (reference default schedule)
    s = 0.008
    steps = args.timesteps
    x = torch.linspace(0, steps, steps + 1)
    ac = torch.cos(((x / steps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = torch.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999)
    alphas_bar = torch.cumprod(1.0 - betas, dim=0)
    sqrt_ab = alphas_bar.sqrt()
    sqrt_1mab = (1 - alphas_bar).sqrt()

    imgs = torch.rand(args.batch, 3, 32, 32) * 2 - 1

    def step():
        t = torch.randint(0, steps, (args.batch,))
        noise = torch.randn_like(imgs)
        x_t = sqrt_ab[t, None, None, None] * imgs \
            + sqrt_1mab[t, None, None, None] * noise
        loss = F.l1_loss(net(x_t, t), noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "torch_cpu_imgs_per_sec": round(args.batch * args.iters / dt, 2),
        "torch_cpu_steps_per_sec": round(args.iters / dt, 4),
        "batch": args.batch, "threads": torch.get_num_threads(),
        "params": sum(p.numel() for p in net.parameters()),
    }))


if __name__ == "__main__":
    main()
