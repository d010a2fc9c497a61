"""Measure the reference-pattern CPU train-step baseline for bench.py.

Reproduces the reference's training step verbatim in torch on CPU at the
512-element scale (ng=2563, B=1000, R=50):
  * CNN-input featurization rebuilt per step
    (FEONet_Stokes_square/train_FEONet.py:277-283)
  * per-sample matmul list comprehension (:261-267)
  * per-DoF Python MSE loop (:290-296)
  * optimizer.step(loss.item) Adam (:396)

The reference commits no training-rate logs (log/ gitignored), so this
in-image measurement defines bench.py's BASELINE fallback. Usage:
    python tools/measure_baseline.py [n_steps]
"""

from __future__ import annotations

import sys
import time

import torch
import torch.nn as nn


def main(n_steps: int = 2) -> float:
    torch.manual_seed(0)
    ng, B, R = 2563, 1000, 50

    class Net2D(nn.Module):
        def __init__(self, f=32, k=5):
            super().__init__()
            self.conv1 = nn.Conv2d(2, f, k, padding=k // 2)
            self.convH = nn.Conv2d(f, f, k, padding=k // 2)
            self.fc = nn.Linear(f * R * R, ng)
            self.act = nn.SiLU()

        def forward(self, x):
            o = self.act(self.conv1(x))
            o = self.convH(o)
            return self.fc(o.flatten(1)).view(-1, 1, ng)

    model = Net2D()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    A = torch.randn(ng, ng)
    load = torch.randn(B, ng)
    coeff = torch.rand(B, 6)
    crit = nn.MSELoss(reduction="sum")
    grid = torch.linspace(-1, 1, R)
    ig = torch.cartesian_prod(grid, grid)

    def step():
        m0, m1, n0, n1, n2, n3 = (coeff[:, [i]] for i in range(6))
        x, y = ig[:, 0], ig[:, 1]
        vf = torch.stack(
            [m0 * torch.sin(n0 * x + n1 * y), m1 * torch.cos(n2 * x + n3 * y)], dim=1
        ).reshape(-1, 2, R, R)
        pred = model(vf)
        LHS = torch.stack([A.mm(u) for u in pred.transpose(1, 2)])
        LHS = torch.sum(LHS, dim=-1)
        loss_wf = torch.zeros(ng)
        for ii in range(ng):
            loss_wf[ii] = crit(LHS[:, ii], load[:, ii])
        loss = torch.sum(loss_wf)
        opt.zero_grad()
        loss.backward()
        opt.step(loss.item)

    times = []
    for i in range(n_steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
        print(f"step {i}: {times[-1]:.1f}s", flush=True)
    rate = 1.0 / (sum(times[1:]) / max(len(times) - 1, 1)) if len(times) > 1 else 1.0 / times[0]
    print(f"baseline: {rate:.5f} steps/s")
    return rate


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
