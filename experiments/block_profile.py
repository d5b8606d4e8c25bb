#!/usr/bin/env python
"""Per-block ms breakdown of one Gibbs iteration at Heavy-metals scale
(VERDICT r2 item 3): ancillary (factor+level-solve+co-transform) /
sufficient (factor+loglik) / beta / 10x chromatic sweeps / noise, plus the
primitive kernels (vecchia_linv, level_solve, linv_mult).

Each block is timed as `reps` chained repetitions inside ONE jitted
fori_loop (a remote-TPU dispatch round-trip would otherwise dominate
ms-scale blocks).  Appends one JSON line per invocation to --out.

Run:  python experiments/block_profile.py --chains 3  --schedule pallas
      python experiments/block_profile.py --chains 96 --schedule pallas
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.cache/jax_comp", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=3)
    ap.add_argument("--schedule", default="pallas",
                    help="sweep schedule to profile: pallas | classed | flat"
                         " | mxu (mxu profiles only the joint sweeps block"
                         " + the full chains-batched iteration)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--gap", action="store_true",
                    help="also time cumulative prefixes of the production "
                         "iteration body (full-vs-blocks gap attribution)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="experiments/block_profile.jsonl")
    args = ap.parse_args()

    import nngp_tpu
    from nngp_tpu.api import _device_problem, _get_mxu_plan, _get_sweep_plan
    from nngp_tpu.models.gaussian import (
        UpdateConfig,
        _ancillary_step,
        _beta_step,
        _chromatic_sweeps,
        _chromatic_sweeps_mxu,
        _chromatic_sweeps_pallas,
        _mu_obs,
        _natural_shape,
        _noise_steps,
        _sufficient_step,
        gibbs_iteration,
        gibbs_iteration_mxu,
    )
    from nngp_tpu.ops.trisolve import level_solve
    from nngp_tpu.ops.vecchia import linv_mult, vecchia_linv
    from nngp_tpu.utils.datasets import load_heavy_metals

    locs, y, X = load_heavy_metals()
    if args.quick:
        k = 8000
        locs, y = locs[:k], y[:k]
        X = {n: v[:k] for n, v in X.items()}

    mc = nngp_tpu.initialize(
        locs, y, X_locs=X, m=5, stationary_covfun="exponential_sphere",
        n_chains=args.chains, seed=1,
    )
    graph, data = _device_problem(mc)
    names = mc.space_time_model["covfun"]["shape_params"]
    cfg = UpdateConfig(
        n_iterations=1, shape_names=tuple(names),
        locs_cols=tuple(int(c) for c in mc.design.locs_cols),
        chromatic_schedule=args.schedule,
        pallas_interpret=(args.schedule == "pallas"
                          and jax.default_backend() != "tpu"),
    )
    plan = _get_sweep_plan(mc) if args.schedule == "pallas" else None
    if args.schedule == "mxu":
        t0 = time.time()
        plan = _get_mxu_plan(mc)
        print(f"mxu plan build: {time.time() - t0:.1f}s", flush=True)
    states = jax.device_put(mc.states)
    key = jax.random.key(0)
    reps = args.reps
    C = args.chains

    def timeit(name, jitted, *call_args):
        out = jitted(*call_args)                    # compile
        jax.block_until_ready(out)
        t0 = time.time()
        out = jitted(*call_args)
        jax.block_until_ready(out)
        total = time.time() - t0
        ms = total / reps * 1000.0
        print(f"{name:28s} {ms:9.3f} ms  ({total:.2f}s / {reps})", flush=True)
        return ms

    results = {}

    if args.schedule == "mxu":
        # chains-batched path: only the joint sweeps block + the full
        # chains-batched iteration differ from the per-chain profile rows
        linv_b = jax.jit(jax.vmap(
            lambda sh: vecchia_linv(graph, _natural_shape(cfg, sh))
        ))(states.shape)
        jax.block_until_ready(linv_b)

        # plan/graph/data are jit *arguments*: the one-hot routing matrices
        # are ~2GB and must not be inlined as program constants (the remote
        # compile request would exceed the tunnel's body-size limit)
        @jax.jit
        def k_sweeps_mxu(states_b, linv_b, plan, graph, data):
            def body(i, st):
                k = jax.random.fold_in(key, i)
                mu_b = jax.vmap(lambda s: _mu_obs(data, s, graph))(st)
                return _chromatic_sweeps_mxu(
                    graph, data, cfg, st, linv_b, mu_b, k, plan)
            return lax.fori_loop(0, reps, body, states_b)

        results["chromatic_sweeps_x10"] = timeit(
            "10x chromatic sweeps (mxu)", k_sweeps_mxu, states, linv_b,
            plan, graph, data)

        @jax.jit
        def whole_mxu(states_b, linv_b, plan, graph, data):
            def body(i, carry):
                st, lv = carry
                k = jax.random.fold_in(key, i)
                keys_c = jax.random.split(k, C)
                zero = st.log_scale * 0
                (c, _) = gibbs_iteration_mxu(
                    graph, data, cfg, (st, lv, zero, zero),
                    (keys_c, jnp.int32(1), jnp.int32(10 ** 9)), plan,
                )
                return c[0], c[1]
            return lax.fori_loop(0, reps, body, (states_b, linv_b))

        results["full_iteration"] = timeit("full gibbs iteration (mxu)",
                                           whole_mxu, states, linv_b,
                                           plan, graph, data)
        entry = {
            "backend": jax.default_backend(),
            "n": int(mc.graph.n),
            "chains": C,
            "schedule": args.schedule,
            "reps": reps,
            "ms": {k: round(v, 3) for k, v in results.items()},
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(entry) + "\n")
        print(f"appended to {args.out}")
        return

    # --- primitive kernels (vmapped over chains) ---
    @jax.jit
    def k_factor(states):
        def body(i, acc):
            nat = jax.vmap(lambda sh: _natural_shape(cfg, sh + i * 1e-7))(
                states.shape)
            lv = jax.vmap(lambda nt: vecchia_linv(graph, nt))(nat)
            return acc + lv[:, 0, 0]
        return lax.fori_loop(0, reps, body, jnp.zeros(C))

    results["vecchia_linv"] = timeit("vecchia_linv (factor build)", k_factor,
                                     states)

    linv_b = jax.jit(jax.vmap(
        lambda sh: vecchia_linv(graph, _natural_shape(cfg, sh))
    ))(states.shape)
    jax.block_until_ready(linv_b)

    @jax.jit
    def k_solve(states, linv_b):
        def body(i, v):
            return jax.vmap(lambda lv, x: level_solve(lv, x, graph))(linv_b, v)
        return lax.fori_loop(0, reps, body, states.field)

    results["level_solve"] = timeit("level_solve", k_solve, states, linv_b)

    @jax.jit
    def k_mult(states, linv_b):
        def body(i, v):
            return jax.vmap(lambda lv, x: linv_mult(lv, x, graph))(linv_b, v)
        return lax.fori_loop(0, reps, body, states.field)

    results["linv_mult"] = timeit("linv_mult", k_mult, states, linv_b)

    # --- sampler blocks ---
    def block_loop(step):
        def run(states, linv_b):
            def body(i, carry):
                st, lv = carry
                k = jax.random.fold_in(key, i)
                return step(st, lv, k)
            return lax.fori_loop(0, reps, body, (states, linv_b))
        return jax.jit(run)

    def anc(st, lv, k):
        def one(s, l, kk):
            mu = _mu_obs(data, s, graph)
            s2, l2, _ = _ancillary_step(graph, data, cfg, s, l, mu, kk)
            return s2, l2
        return jax.vmap(one)(st, lv, jax.random.split(k, C))

    results["ancillary_block"] = timeit("ancillary MH block",
                                        block_loop(anc), states, linv_b)

    def suf(st, lv, k):
        def one(s, l, kk):
            s2, l2, _ = _sufficient_step(graph, data, cfg, s, l, kk)
            return s2, l2
        return jax.vmap(one)(st, lv, jax.random.split(k, C))

    results["sufficient_block"] = timeit("sufficient MH block",
                                         block_loop(suf), states, linv_b)

    def beta(st, lv, k):
        def one(s, l, kk):
            return _beta_step(graph, data, cfg, s, l, kk), l
        return jax.vmap(one)(st, lv, jax.random.split(k, C))

    results["beta_block"] = timeit("beta block (interweaved)",
                                   block_loop(beta), states, linv_b)

    def sweeps(st, lv, k):
        def one(s, l, kk):
            mu = _mu_obs(data, s, graph)
            if args.schedule == "pallas":
                s2 = _chromatic_sweeps_pallas(graph, data, cfg, s, l, mu, kk,
                                              plan)
            else:
                s2 = _chromatic_sweeps(graph, data, cfg, s, l, mu, kk)
            return s2, l
        return jax.vmap(one)(st, lv, jax.random.split(k, C))

    results["chromatic_sweeps_x10"] = timeit(
        f"10x chromatic sweeps ({args.schedule})", block_loop(sweeps),
        states, linv_b)

    def noise(st, lv, k):
        def one(s, l, kk):
            mu = _mu_obs(data, s, graph)
            return _noise_steps(graph, data, cfg, s, mu, kk), l
        return jax.vmap(one)(st, lv, jax.random.split(k, C))

    results["noise_block_x10"] = timeit("10x noise MH", block_loop(noise),
                                        states, linv_b)

    # --- whole iteration (the scan body used in production) ---
    @jax.jit
    def whole(states, linv_b):
        def body(i, carry):
            st, lv = carry
            k = jax.random.fold_in(key, i)

            def one(s, l, kk):
                (c, rec) = gibbs_iteration(
                    graph, data, cfg,
                    (s, l, jnp.zeros((), s.field.dtype),
                     jnp.zeros((), s.field.dtype)),
                    (kk, jnp.int32(1), jnp.int32(10 ** 9)), plan=plan,
                )
                return c[0], c[1]
            return jax.vmap(one)(st, lv, jax.random.split(k, C))
        return lax.fori_loop(0, reps, body, (states, linv_b))

    results["full_iteration"] = timeit("full gibbs iteration", whole,
                                       states, linv_b)

    # --- cumulative-prefix timings of the REAL iteration body (chases the
    # full-vs-sum-of-blocks gap: isolated blocks can fuse/schedule
    # differently than the production composition) ---
    if args.gap:
        from nngp_tpu.models.gaussian import _pre_chromatic

        def prefix(upto):
            @jax.jit
            def run(states, linv_b):
                def body(i, carry):
                    st, lv = carry
                    k = jax.random.fold_in(key, i)

                    def one(s, l, kk):
                        carry1, mu, k_sw, k_nz = _pre_chromatic(
                            graph, data, cfg,
                            (s, l, jnp.zeros((), s.field.dtype),
                             jnp.zeros((), s.field.dtype)),
                            (kk, jnp.int32(1), jnp.int32(10 ** 9)),
                        )
                        s2, l2 = carry1[0], carry1[1]
                        if upto >= 1:
                            if args.schedule == "pallas":
                                s2 = _chromatic_sweeps_pallas(
                                    graph, data, cfg, s2, l2, mu, k_sw, plan)
                            else:
                                s2 = _chromatic_sweeps(
                                    graph, data, cfg, s2, l2, mu, k_sw)
                        if upto >= 2:
                            s2 = _noise_steps(graph, data, cfg, s2, mu, k_nz)
                        return s2, l2
                    return jax.vmap(one)(st, lv, jax.random.split(k, C))
                return lax.fori_loop(0, reps, body, (states, linv_b))
            return run

        results["prefix_pre"] = timeit("prefix: pre-chromatic only",
                                       prefix(0), states, linv_b)
        results["prefix_pre_sweeps"] = timeit("prefix: pre + sweeps",
                                              prefix(1), states, linv_b)
        results["prefix_pre_sweeps_noise"] = timeit(
            "prefix: pre + sweeps + noise", prefix(2), states, linv_b)
    block_sum = (results["ancillary_block"] + results["sufficient_block"]
                 + results["beta_block"] + results["chromatic_sweeps_x10"]
                 + results["noise_block_x10"])
    print(f"{'sum of blocks':28s} {block_sum:9.3f} ms")

    entry = {
        "backend": jax.default_backend(),
        "n": int(mc.graph.n),
        "chains": C,
        "schedule": args.schedule,
        "reps": reps,
        "ms": {k: round(v, 3) for k, v in results.items()},
        "block_sum_ms": round(block_sum, 3),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
