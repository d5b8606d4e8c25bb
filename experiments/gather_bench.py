#!/usr/bin/env python
"""TPU micro-benchmark: irregular-gather strategies for the chromatic sweep.

The chromatic field update's cost model is gathered-element count
(~25-60 ns/elt via XLA gather, CLAUDE.md).  Candidates:

  A. XLA gather loop (current production path): per block, w[nbrs] from HBM.
  B. Pallas kernel, field resident in VMEM, whole sweep in one kernel,
     gather via jnp.take along axis 0 (Mosaic dynamic-gather if supported).
  C. Pallas kernel, VMEM field, scalar fori_loop gather (always lowers).

Shapes mirror the Heavy-metals classed schedule: n=64k sites, blocks of
B=1024 sites x W=16 neighbors, ~60 blocks per sweep, 10 sweeps.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import os
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

N = 65536
B = 1024
W = 16
NB = 60           # blocks per sweep
SWEEPS = 10

rng = np.random.default_rng(0)
w0 = jnp.asarray(rng.normal(size=N + 1).astype(np.float32))
# block site lists: disjoint-ish random sites; neighbor indices random
sites = jnp.asarray(rng.integers(0, N, size=(NB, B)).astype(np.int32))
nbrs = jnp.asarray(rng.integers(0, N, size=(NB, B, W)).astype(np.int32))
q = jnp.asarray(rng.normal(size=(NB, B, W)).astype(np.float32))
P = jnp.asarray(rng.uniform(1.0, 2.0, size=(NB, B)).astype(np.float32))
noise = jnp.asarray(rng.normal(size=(SWEEPS, NB, B)).astype(np.float32))


@jax.jit
def xla_sweeps(w, noise):
    def one_sweep(s, w):
        def block(b, w):
            g = w[nbrs[b]]                       # [B, W] gather
            mean = jnp.sum(q[b] * g, axis=1) / P[b]
            return w.at[sites[b]].set(mean + noise[s, b] * lax.rsqrt(P[b]))
        return lax.fori_loop(0, NB, block, w)
    return lax.fori_loop(0, SWEEPS, one_sweep, w)


def timeit(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    print("backend:", jax.default_backend())
    t = timeit(xla_sweeps, w0, noise)
    elems = SWEEPS * NB * B * W
    print(f"A XLA gather loop: {t*1e3:.1f} ms  ({t/elems*1e9:.1f} ns/elt)")

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # B: whole-sweep kernel, field in VMEM, vector gather via jnp.take
    def kernel_take(sites_ref, nbrs_ref, q_ref, P_ref, noise_ref, w_ref, out_ref):
        out_ref[:] = w_ref[:]
        def one_sweep(s, _):
            def block(b, _):
                idx = nbrs_ref[b]                            # [B, W]
                g = jnp.take(out_ref[:].reshape(-1), idx.reshape(-1),
                             axis=0).reshape(B, W)
                mean = jnp.sum(q_ref[b] * g, axis=1) / P_ref[b]
                val = mean + noise_ref[s, b] * lax.rsqrt(P_ref[b])
                st = sites_ref[b]
                cur = out_ref[:].reshape(-1)
                new = cur.at[st].set(val)
                out_ref[:] = new.reshape(out_ref.shape)
                return 0
            return lax.fori_loop(0, NB, block, 0)
        lax.fori_loop(0, SWEEPS, one_sweep, 0)

    w2 = jnp.pad(w0, (0, 128 * 520 - (N + 1))).reshape(520, 128)

    try:
        f = pl.pallas_call(
            kernel_take,
            out_shape=jax.ShapeDtypeStruct(w2.shape, w2.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        fj = jax.jit(lambda *a: f(*a))
        t = timeit(fj, sites, nbrs, q, P, noise, w2)
        print(f"B pallas take: {t*1e3:.1f} ms  ({t/elems*1e9:.1f} ns/elt)")
    except Exception as e:
        print("B pallas take FAILED:", type(e).__name__, str(e)[:500])


if __name__ == "__main__":
    main()
