"""Diagnose the stream-dependent stuck chains of the 96-chain HM runs.

Reruns the first 6 cycles (1200 iters) of the failing configuration
(deterministic: same seed + keys as examples/heavy_metals_96.py), then
prints per-chain summaries over the last cycle's records: mean/sd of
log_scale / log_range / log_noise, final tk values, and flags chains
whose within-cycle sd is ~0 (frozen) or whose values sit at the support
boundaries.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/stuck96_diag.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.cache/jax_comp", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

import nngp_tpu
from nngp_tpu.utils.datasets import load_heavy_metals


def main():
    locs, y, X = load_heavy_metals()
    mc = nngp_tpu.initialize(
        locs, y, X_locs=X, m=5, stationary_covfun="exponential_sphere",
        n_chains=96, seed=1,
    )
    rng = np.random.default_rng(0)
    cols = np.sort(rng.choice(mc.graph.n, size=64, replace=False))
    mc = nngp_tpu.run(
        mc, n_cycles=6, n_iterations_update=200, field_thinning=0.05,
        Gelman_Rubin_Brooks_stop=(0.0, 0.0), verbose=True,
        chromatic_schedule="pallas", field_record_columns=cols,
    )
    st = jax.tree.map(np.asarray, mc.states)
    T = mc.iterations
    lo = T - 200
    rows = []
    for c, rec in enumerate(mc.records):
        ls = rec["log_scale"][lo:T]
        lr = rec["shape"][lo:T, 0]
        lnv = rec["log_noise_variance"][lo:T]
        rows.append({
            "chain": c,
            "ls_mean": round(float(ls.mean()), 3),
            "ls_sd": round(float(ls.std()), 5),
            "lr_mean": round(float(lr.mean()), 3),
            "lr_sd": round(float(lr.std()), 5),
            "lnv_mean": round(float(lnv.mean()), 3),
            "tk_anc": round(float(st.tk_ancillary[c]), 2),
            "tk_suf": round(float(st.tk_sufficient[c]), 2),
        })
    var_y = float(np.var(mc.observed_field, ddof=1))
    print(f"\nlog(var_y) = {np.log(var_y):.3f}; range_cap = "
          f"{float(mc.data.range_cap):.3f} (log {np.log(float(mc.data.range_cap)):.2f}); "
          f"range_floor = {float(np.asarray(mc.data.range_floor)[0]):.2e} "
          f"(log {np.log(float(np.asarray(mc.data.range_floor)[0])):.2f})")
    # sort by ls_mean to surface the outliers
    rows.sort(key=lambda r: r["ls_mean"])
    print(f"{'chain':>5} {'ls_mean':>8} {'ls_sd':>8} {'lr_mean':>8} "
          f"{'lr_sd':>8} {'lnv_mean':>8} {'tk_anc':>7} {'tk_suf':>7}")
    for r in rows[:12] + [{"chain": "..."}] + rows[-12:]:
        if r["chain"] == "...":
            print("  ...")
            continue
        print(f"{r['chain']:>5} {r['ls_mean']:>8} {r['ls_sd']:>8} "
              f"{r['lr_mean']:>8} {r['lr_sd']:>8} {r['lnv_mean']:>8} "
              f"{r['tk_anc']:>7} {r['tk_suf']:>7}")
    frozen = [r for r in rows if r["chain"] != "..." and r["ls_sd"] < 1e-4]
    print(f"\nfrozen-scale chains (ls_sd < 1e-4): {len(frozen)}")
    with open("experiments/stuck96_diag.json", "w") as f:
        json.dump({"rows": rows, "log_var_y": np.log(var_y)}, f, indent=1)
    print("wrote experiments/stuck96_diag.json")


if __name__ == "__main__":
    main()
