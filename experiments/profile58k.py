#!/usr/bin/env python
"""Per-config timing of the Heavy-metals workload at full size (n=58k).

One config per invocation (the remote TPU worker is single-tenant and
fragile; a crash then loses only one measurement).  Appends one JSON line
to --out.

Configs (--config):
  full-classed     complete iteration, classed XLA chromatic schedule
  full-flat        complete iteration, flat XLA schedule
  full-pallas      complete iteration, routed-gather Pallas sweeps
  no-chromatic     n_chromatic=0 (isolates the sweep cost)
  no-chrom-anc     n_chromatic=0 + ancillary off (isolates the ancillary
                   block: vecchia_linv + level solve + co-transform)
Use --chains to vary the vmapped chain count (scaling curve).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="full-classed")
    ap.add_argument("--chains", type=int, default=3)
    ap.add_argument("--iters", type=int, default=50, help="iters per cycle call")
    ap.add_argument("--cycles", type=int, default=2, help="timed cycle calls")
    ap.add_argument("--quick", action="store_true", help="8k subset")
    ap.add_argument("--out", default="experiments/profile58k.jsonl")
    args = ap.parse_args()

    import nngp_tpu
    from nngp_tpu.utils.datasets import load_heavy_metals

    locs, y, X = load_heavy_metals()
    if args.quick:
        k = 8000
        locs, y = locs[:k], y[:k]
        X = {n: v[:k] for n, v in X.items()}

    t0 = time.time()
    mc = nngp_tpu.initialize(
        locs, y, X_locs=X, m=5, stationary_covfun="exponential_sphere",
        n_chains=args.chains, seed=1,
    )
    setup_s = time.time() - t0

    schedule = {
        "full-classed": "classed", "full-flat": "flat",
        "full-pallas": "pallas", "no-chromatic": "classed",
        "no-chrom-anc": "classed", "one-chromatic": "classed",
        "one-pallas": "pallas", "full-mxu": "mxu", "one-mxu": "mxu",
    }[args.config]
    n_chromatic = {"no-chromatic": 0, "no-chrom-anc": 0,
                   "one-chromatic": 1, "one-pallas": 1,
                   "one-mxu": 1}.get(args.config, 10)
    ancillary = args.config != "no-chrom-anc"

    knobs = dict(
        n_iterations_update=args.iters, verbose=False, field_thinning=0.04,
        Gelman_Rubin_Brooks_stop=(0.0, 0.0), chromatic_schedule=schedule,
        n_chromatic=n_chromatic, ancillary=ancillary,
        max_device_iters=args.iters,
    )
    t0 = time.time()
    plan_s = 0.0
    if schedule == "pallas":
        from nngp_tpu.api import _get_sweep_plan

        _get_sweep_plan(mc)
        plan_s = time.time() - t0
    elif schedule == "mxu":
        from nngp_tpu.api import _get_mxu_plan

        _get_mxu_plan(mc)
        plan_s = time.time() - t0
    t0 = time.time()
    mc = nngp_tpu.run(mc, n_cycles=1, **knobs)
    jax.block_until_ready(mc.states.field)
    warm_s = time.time() - t0
    t0 = time.time()
    mc = nngp_tpu.run(mc, n_cycles=args.cycles, **knobs)
    jax.block_until_ready(mc.states.field)
    wall = time.time() - t0
    iters = args.cycles * args.iters
    row = {
        "config": args.config,
        "chains": args.chains,
        "n": int(mc.graph.n),
        "backend": jax.default_backend(),
        "setup_s": round(setup_s, 1),
        "plan_s": round(plan_s, 1),
        "warmup_s": round(warm_s, 1),
        "timed_iters": iters,
        "wall_s": round(wall, 2),
        "it_per_s": round(iters / wall, 3),
        "ms_per_iter": round(1000 * wall / iters, 1),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
