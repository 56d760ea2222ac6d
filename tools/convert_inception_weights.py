#!/usr/bin/env python
"""Convert pytorch-fid InceptionV3 weights to the npz igm_tpu loads.

Run on any machine with the torch weights available:

    python tools/convert_inception_weights.py pt_inception-2015-12-05.pth \
        inception_fid.npz

then point IGM_INCEPTION_WEIGHTS at the npz.  BN running stats are folded
into per-channel (scale, bias) pairs:

    scale = gamma / sqrt(running_var + eps),  bias = beta - mean * scale

Torch conv kernels are OIHW; Flax wants HWIO.
"""
from __future__ import annotations

import sys

import numpy as np


def convert(state_dict, eps: float = 1e-3) -> dict:
    out = {}
    # group keys by module prefix: <mod>.conv.weight + <mod>.bn.{...}
    prefixes = sorted({k.rsplit(".conv.weight", 1)[0]
                       for k in state_dict if k.endswith(".conv.weight")})
    for prefix in prefixes:
        w = np.asarray(state_dict[f"{prefix}.conv.weight"])  # OIHW
        gamma = np.asarray(state_dict[f"{prefix}.bn.weight"])
        beta = np.asarray(state_dict[f"{prefix}.bn.bias"])
        mean = np.asarray(state_dict[f"{prefix}.bn.running_mean"])
        var = np.asarray(state_dict[f"{prefix}.bn.running_var"])
        scale = gamma / np.sqrt(var + eps)
        bias = beta - mean * scale
        # torch module path e.g. "Mixed_5b.branch1x1" -> flax
        # "Mixed_5b.branch1x1.conv.kernel" etc.
        out[f"{prefix}.conv.kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
        out[f"{prefix}.bn_scale"] = scale
        out[f"{prefix}.bn_bias"] = bias
    return out


def main() -> None:
    import torch
    src, dst = sys.argv[1], sys.argv[2]
    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    np.savez(dst, **convert({k: v.numpy() for k, v in sd.items()
                             if hasattr(v, "numpy")}))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
