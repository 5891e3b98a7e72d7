"""Dev-only golden generator: runs the REFERENCE MaxFactor/FAMScheduler2
(requires /root/reference on the machine) on fixed tensors and stores
the resulting parameter trajectories in tests/golden/maxfactor.npz.

The test suite consumes only the .npz — it never imports the reference.
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from optimizerc import FAMScheduler2, MaxFactor  # noqa: E402


def main():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)

    # shapes: 2-D weight, 1-D bias, 3-D conv-like, 0-D scalar
    shapes = [(8, 16), (16,), (4, 6, 5), ()]
    def randn(s):
        return np.asarray(rng.randn(*s), dtype=np.float32)

    params_main = [torch.nn.Parameter(torch.tensor(randn(s)))
                   for s in shapes]
    params_jump = [torch.nn.Parameter(torch.tensor(randn(s)))
                   for s in shapes]
    grads = [[torch.tensor(randn(s) * 0.1) for s in shapes]
             for _ in range(5)]                       # 5 steps, both groups

    opt = MaxFactor([
        {"params": params_main, "bias": 1.0},
        {"params": params_jump, "bias": 2.0},
    ], lr=2.5e-3, b_decay=-0.8, eps=(1e-8, 1e-8), d=1.0, decay=1e-2,
        gamma=0.99, max=False, bias=1, min_lr=1e-9, clip=False, cap=0.0)
    sched = FAMScheduler2(opt, warmup_steps=10, total_steps=100,
                          decay_start=None, warmup_start=1e-6,
                          eta_min=1e-6, last_epoch=-1)

    snap = {"init_main": [p.detach().numpy().copy() for p in params_main],
            "init_jump": [p.detach().numpy().copy() for p in params_jump],
            "grads": [[g.numpy() for g in step] for step in grads]}
    traj_main, traj_jump, lrs = [], [], []
    for step in range(5):
        lrs.append(sched.get_last_lr()[0])
        for p, g in zip(params_main, grads[step]):
            p.grad = g.clone()
        for p, g in zip(params_jump, grads[step]):
            p.grad = g.clone()
        opt.step()
        opt.zero_grad()
        sched.step()
        traj_main.append([p.detach().numpy().copy() for p in params_main])
        traj_jump.append([p.detach().numpy().copy() for p in params_jump])

    # full lr curve for the schedule test
    opt2 = MaxFactor([torch.nn.Parameter(torch.zeros(2))], lr=2.5e-3)
    s2 = FAMScheduler2(opt2, warmup_steps=10, total_steps=100,
                       decay_start=None, warmup_start=1e-6, eta_min=1e-6)
    curve = []
    for _ in range(100):
        curve.append(s2.get_last_lr()[0])
        s2.step()

    out = {"lrs": np.asarray(lrs), "lr_curve": np.asarray(curve)}
    for i, s in enumerate(shapes):
        out[f"init_main_{i}"] = snap["init_main"][i]
        out[f"init_jump_{i}"] = snap["init_jump"][i]
        for t in range(5):
            out[f"grad_{t}_{i}"] = snap["grads"][t][i]
            out[f"main_{t}_{i}"] = traj_main[t][i]
            out[f"jump_{t}_{i}"] = traj_jump[t][i]
    np.savez("/root/repo/tests/golden/maxfactor.npz", **out)
    print("wrote tests/golden/maxfactor.npz",
          {k: v.shape for k, v in list(out.items())[:4]})


if __name__ == "__main__":
    main()
