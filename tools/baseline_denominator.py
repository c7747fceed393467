"""Measure the torch-CPU anchor behind bench.py's ``vs_baseline``
denominator (VERDICT r2 item 5).

The reference publishes no numbers (BASELINE.md), so the denominator is
derived two independent ways, documented in BASELINE.md:

1. **A100 HBM roofline** (analytic, no hardware needed): the reference
   step is 8192 rays x 1024 samples x 16 levels x 8 corners = 1.07e9
   random 4-byte (fp16 row) table reads forward + the same count of
   atomicAdd contributions backward. Random reads resolve as >=32-byte
   HBM sectors, so fwd + bwd >= ~3 x 34 GB of traffic; at A100-40GB's
   1.555 TB/s that is >= 66 ms/step => <= ~1.24e5 rays/s. bench.py's 1e5
   assumes the reference achieves ~80% of this bound.

2. **Torch CPU anchor** (this tool): the same hash-encode + MLP fwd+bwd
   at the reference capacity, in plain torch on this machine's CPUs —
   a measured lower anchor showing the denominator is not understated
   (any plausible CPU->A100 factor lands the reference within a small
   multiple of 1e5, far below this repo's flagship rate).

Usage: python -m tools.baseline_denominator [rays=256] [iters=3]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import torch

    torch.manual_seed(0)
    rays, iters = 256, 3
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "rays":
            rays = int(v)
        elif k == "iters":
            iters = int(v)

    # reference capacity (configs/instant_ngp.json)
    n_samples, n_levels, n_feats, log2_size = 1024, 16, 2, 21
    base_res, growth = 16, 1.3819
    m = rays * n_samples
    hashmap = 1 << log2_size
    primes = (1, 2654435761, 805459861)

    scales = [float(np.exp2(lv * np.log2(growth)) * base_res - 1.0)
              for lv in range(n_levels)]
    res = [int(np.ceil(s)) + 1 for s in scales]
    sizes = [min(r ** 3, hashmap) for r in res]
    offs = np.cumsum([0] + sizes)[:-1]
    table = torch.empty(int(np.sum(sizes)), n_feats).uniform_(-1e-4, 1e-4)
    table.requires_grad_(True)

    corners = torch.tensor(
        [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)]
    )  # (8, 3)

    def encode(x):
        outs = []
        for lv in range(n_levels):
            pos = x * scales[lv] + 0.5
            base = torch.clamp(pos.floor().long(), 0, res[lv] - 2)
            frac = pos - pos.floor()
            g = base[:, None, :] + corners[None]  # (M, 8, 3)
            if res[lv] ** 3 <= hashmap:
                idx = (g[..., 0] + res[lv] * (g[..., 1] + res[lv] * g[..., 2]))
            else:
                acc = g[..., 0] * primes[0]
                acc = acc ^ (g[..., 1] * primes[1])
                acc = acc ^ (g[..., 2] * primes[2])
                idx = acc % hashmap
            w = torch.where(corners[None] == 1, frac[:, None, :],
                            1.0 - frac[:, None, :]).prod(-1)
            feats = table[int(offs[lv]) + idx]  # (M, 8, F)
            outs.append((feats * w[..., None]).sum(1))
        return torch.cat(outs, -1)

    mlp1 = torch.nn.Sequential(
        torch.nn.Linear(n_levels * n_feats, 32, bias=False), torch.nn.ReLU(),
        torch.nn.Linear(32, 16, bias=False),
    )
    mlp2 = torch.nn.Sequential(
        torch.nn.Linear(16, 32, bias=False), torch.nn.ReLU(),
        torch.nn.Linear(32, 32, bias=False), torch.nn.ReLU(),
        torch.nn.Linear(32, 4, bias=False),
    )

    x = torch.rand(m, 3)

    def step():
        enc = encode(x)
        h = mlp1(enc)
        sigma = torch.relu(h[:, :1]).reshape(rays, n_samples)
        color = torch.relu(mlp2(h)).reshape(rays, n_samples, 4)
        # Beer-Lambert composite + mse (cheap next to encode+MLP)
        alpha = 1.0 - torch.exp(-sigma * (2.0 / n_samples))
        trans = torch.cumprod(1.0 - alpha + 1e-10, dim=1)
        wgt = (alpha * trans)[..., None]
        pred = (wgt * color).sum(1)
        loss = (pred - 0.5).pow(2).mean()
        loss.backward()
        for p in [table, *mlp1.parameters(), *mlp2.parameters()]:
            p.grad = None
        return float(loss)

    step()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    print(
        f"torch CPU fwd+bwd at reference capacity: {rays} rays x "
        f"{n_samples} samples ({m / 1e6:.2f} M pts, 2^{log2_size} tables): "
        f"{dt * 1e3:.0f} ms/step -> {rays / dt:.1f} rays/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
