"""A/B the adaptive-covariance proposal against the reference-isotropic
proposal on a CPU testbed: the Heavy-metals 8k subset, 3 chains, the
20x200 protocol (classed schedule).

Arms:
  am        — the current tree's AM proposal (ChainState.prop_* active)
  isotropic — prop_* stripped to None => exactly the reference's proposal

Reports, per arm: final MPSRF, worst univariate, and IACT of log_scale /
log_range / log_noise over the second half.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python experiments/am_ab_cpu.py [--seeds 2]
"""

import argparse
import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def iact(x):
    x = np.asarray(x, np.float64)
    x = x - x.mean()
    n = len(x)
    f = np.fft.rfft(x, 2 * n)
    acov = np.fft.irfft(f * np.conj(f))[: n // 2] / n
    rho = acov / acov[0]
    tau = 1.0
    for k in range(1, n // 2):
        if rho[k] <= 0.05:
            break
        tau += 2 * rho[k]
    return float(tau)


def run_arm(arm, seed, cycles, iters):
    import nngp_tpu
    from nngp_tpu.utils.datasets import load_heavy_metals

    locs, y, X = load_heavy_metals()
    k = 8000
    locs, y = locs[:k], y[:k]
    X = {n: v[:k] for n, v in X.items()}
    mc = nngp_tpu.initialize(locs, y, X_locs=X, m=5,
                             stationary_covfun="exponential_sphere",
                             n_chains=3, seed=seed)
    if arm == "isotropic":
        mc.states = replace(mc.states, prop_mean=None, prop_m2=None,
                            prop_count=None)
    knobs = dict(n_iterations_update=iters, field_thinning=0.05,
                 verbose=False, Gelman_Rubin_Brooks_stop=(0.0, 0.0))
    t0 = time.time()
    if arm == "am_k3":
        # two-phase: K=1 through the adaptation half, then 3 ASIS pairs
        # per iteration (the heavy_metals_96.py protocol)
        mc = nngp_tpu.run(mc, n_cycles=cycles // 2, **knobs)
        mc = nngp_tpu.run(mc, n_cycles=cycles - cycles // 2,
                          covparams_steps=3, **knobs)
    else:
        mc = nngp_tpu.run(mc, n_cycles=cycles, **knobs)
    wall = time.time() - t0
    grb = mc.diagnostics["Gelman_Rubin_Brooks"][-1]
    uni = dict(zip(grb["names"][1:], grb["R_hat"][1:]))
    T = mc.iterations
    lo = T // 2
    taus = {}
    for key, get in (("log_scale", lambda r: r["log_scale"]),
                     ("log_range", lambda r: r["shape"][:, 0]),
                     ("log_noise", lambda r: r["log_noise_variance"])):
        taus[key] = round(float(np.mean(
            [iact(get(r)[lo:T]) for r in mc.records])), 1)
    out = {
        "arm": arm, "seed": seed, "iterations": T,
        "wall_s": round(wall, 1),
        "mpsrf": round(float(grb["R_hat"][0]), 3),
        "worst_uni": round(float(max(uni.values())), 3),
        "worst_uni_name": max(uni, key=uni.get),
        "rhat_ls": round(float(uni["log_scale"]), 3),
        "rhat_lr": round(float(uni["log_range"]), 3),
        "rhat_lnv": round(float(uni["log_noise_variance"]), 3),
        "iact_2nd_half": taus,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--cycles", type=int, default=20)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--arms", default="am,isotropic")
    ap.add_argument("--out", default="experiments/am_ab_cpu.jsonl")
    args = ap.parse_args()
    rows = []
    for seed in range(1, args.seeds + 1):
        for arm in args.arms.split(","):
            rows.append(run_arm(arm, seed, args.cycles, args.iters))
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
