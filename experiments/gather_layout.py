#!/usr/bin/env python
"""XLA gather microbenchmark: chain-batched layouts for the chromatic sweep.

Question: does storing the field with a trailing chains axis ([n, C], chains
on lanes) make the per-sweep neighbor gather (and scatter) cost independent
of the chain count, vs. the current vmapped [C, n] layout?

Measures, at Heavy-metals scale (n=64k, deg=12):
  A. [C, n] vmapped element gather    w[c, nbrs]      (current layout)
  B. [n, C] row gather                w[nbrs, :]      (proposed layout)
  C. row gather + scatter-set rows    (one sweep step shape)
for C in {1, 3, 8, 24} — one jitted fori_loop of 10 "sweeps" each.
"""

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

N = 58097
DEG = 12
SWEEPS = 10
NB = 16                       # blocks per sweep (sites split into blocks)
B = (N // NB // 128 + 1) * 128


def bench(fn, args, label):
    # block_until_ready on the remote axon backend does not synchronize;
    # force a tiny host transfer (scalar reduce) as the fence instead
    f = jax.jit(fn)
    w = f(*args)
    _ = float(jnp.sum(w))
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        # chain the field through so no rep can be elided or overlapped away
        w = f(w, *args[1:])
    _ = float(jnp.sum(w))
    dt = (time.time() - t0) / reps
    print(json.dumps({"label": label, "s_per_10sweeps": round(dt, 5)}))
    return dt


def main():
    rng = np.random.default_rng(0)
    nbrs = rng.integers(0, N, size=(NB, B, DEG)).astype(np.int32)
    sites = np.stack(
        [rng.permutation(N)[:B] for _ in range(NB)]
    ).astype(np.int32)
    q = rng.normal(size=(NB, B, DEG)).astype(np.float32)
    nbrs_j, sites_j, q_j = jnp.asarray(nbrs), jnp.asarray(sites), jnp.asarray(q)

    results = {}
    for C in (1, 3, 8, 24, 48):
        wA = jnp.asarray(rng.normal(size=(C, N)).astype(np.float32))
        wB = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
        qc = jnp.broadcast_to(q_j[None], (C,) + q.shape)

        # A: vmapped [C, n] element gather + scatter (current design)
        def sweepsA(w, nbrs, sites, qc):
            def one(s, w):
                def blk(b, w):
                    g = w[:, nbrs[b]]                       # [C, B, DEG]
                    pri = jnp.sum(qc[:, b] * g, axis=-1)    # [C, B]
                    return w.at[:, sites[b]].set(pri)
                return lax.fori_loop(0, NB, blk, w)
            return lax.fori_loop(0, SWEEPS, one, w)

        tA = bench(sweepsA, (wA, nbrs_j, sites_j, qc), f"A elem-gather C={C}")

        # B: [n, C] row gather + row scatter
        def sweepsB(w, nbrs, sites, qc):
            def one(s, w):
                def blk(b, w):
                    g = w[nbrs[b]]                          # [B, DEG, C]
                    pri = jnp.einsum("cbd,bdc->bc", qc[:, b], g)
                    return w.at[sites[b]].set(pri)
                return lax.fori_loop(0, NB, blk, w)
            return lax.fori_loop(0, SWEEPS, one, w)

        tB = bench(sweepsB, (wB, nbrs_j, sites_j, qc), f"B row-gather C={C}")
        results[C] = {"A": tA, "B": tB}

    print(json.dumps({"summary": {
        str(c): {k: round(v, 4) for k, v in r.items()}
        for c, r in results.items()
    }}))


if __name__ == "__main__":
    main()
