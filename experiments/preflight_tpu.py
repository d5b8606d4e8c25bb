#!/usr/bin/env python
"""Run the pallas-vs-flat parity preflight on the real TPU at Heavy-metals
scale and print the result (VERDICT r1 item 2)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.cache/jax_comp", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    import nngp_tpu
    from nngp_tpu.diagnostics.preflight import (
        chromatic_sweep_parity,
        mxu_sweep_parity,
    )
    from nngp_tpu.utils.datasets import load_heavy_metals

    locs, y, X = load_heavy_metals()
    if os.environ.get("QUICK") == "1":
        k = 8000
        locs, y = locs[:k], y[:k]
        X = {n: v[:k] for n, v in X.items()}
    mc = nngp_tpu.initialize(
        locs, y, X_locs=X, m=5, stationary_covfun="exponential_sphere",
        n_chains=1, seed=1,
    )
    which = os.environ.get("WHICH", "both")
    out = {}
    if which in ("pallas", "both"):
        out["pallas"] = chromatic_sweep_parity(mc)
        print(json.dumps({"pallas": out["pallas"]}), flush=True)
    if which in ("mxu", "both"):
        out["mxu"] = mxu_sweep_parity(mc)
        print(json.dumps({"mxu": out["mxu"]}), flush=True)
    # read-merge-write: a WHICH=pallas/mxu partial run must not clobber the
    # other schedule's recorded result (ADVICE r2)
    path = "experiments/preflight_tpu.json"
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except (json.JSONDecodeError, OSError):
            merged = {}
    merged.update(out)
    with open(path, "w") as f:
        json.dump(merged, f)


if __name__ == "__main__":
    main()
