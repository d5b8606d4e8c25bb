#!/usr/bin/env python
"""Probe which dynamic-gather forms Mosaic lowers, and their throughput."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

R = 512          # field rows (sublanes)
C = 128          # lanes
RI = 1024        # index rows

rng = np.random.default_rng(0)
src = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
row_idx = jnp.asarray(rng.integers(0, R, size=(RI, C)).astype(np.int32))
lane_idx = jnp.asarray(rng.integers(0, C, size=(RI, C)).astype(np.int32))


def try_kernel(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        fj = jax.jit(f)
        out = fj(*args)
        jax.block_until_ready(out)
        # time with an inner repeat loop to amortize launch overhead
        def kern_rep(*refs):
            def body(i, acc):
                kernel(*refs)
                return acc
            lax.fori_loop(0, 100, body, 0)
        frep = jax.jit(pl.pallas_call(
            kern_rep, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        o = frep(*args); jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(5):
            o = frep(*args)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / 5 / 100
        elems = int(np.prod(out_shape.shape))
        print(f"{name}: OK  {dt*1e6:.1f} us/call  ({dt/elems*1e9:.3f} ns/elt)")
        return True
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}")
        return False


def main():
    print("backend:", jax.default_backend())
    out_sh = jax.ShapeDtypeStruct((RI, C), jnp.float32)

    # 1. sublane gather: out[i,j] = src[row_idx[i,j], j]
    def k_sub(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)
    try_kernel("take_along_axis axis=0 (sublane)", k_sub, out_sh, src, row_idx)

    # 2. lane gather: out[i,j] = x[i, lane_idx[i,j]] with x [RI, C]
    x2 = jnp.asarray(rng.normal(size=(RI, C)).astype(np.float32))
    def k_lane(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)
    try_kernel("take_along_axis axis=1 (lane)", k_lane, out_sh, x2, lane_idx)

    # 3. chained: arbitrary gather = sublane then lane
    def k_chain(src_ref, ridx_ref, lidx_ref, out_ref):
        a = jnp.take_along_axis(src_ref[:], ridx_ref[:], axis=0)
        out_ref[:] = jnp.take_along_axis(a, lidx_ref[:], axis=1)
    try_kernel("chained sublane+lane", k_chain, out_sh, src, row_idx, lane_idx)

    # 4. scatter: out[idx[i,j], j] = val[i,j] via .at.set on a value
    def k_scat(val_ref, idx_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        cur = out_ref[:]
        out_ref[:] = cur.at[idx_ref[:, 0], 0].set(val_ref[:, 0])
    try_kernel("scatter .at[vec,0].set", k_scat,
               jax.ShapeDtypeStruct((R, C), jnp.float32),
               jnp.asarray(rng.normal(size=(RI, C)).astype(np.float32)),
               jnp.asarray(rng.integers(0, R, size=(RI, C)).astype(np.int32)))

    # 5. full take_along 2D scatter-equivalent via one-hot matmul (MXU):
    # out[s] = sum_i onehot[s,i] val[i] for a [R,RI] onehot — cost check only
    def k_mm(oh_ref, val_ref, out_ref):
        out_ref[:] = jnp.dot(oh_ref[:], val_ref[:],
                             preferred_element_type=jnp.float32)
    try_kernel("one-hot matmul 512x1024 @ 1024x128", k_mm,
               jax.ShapeDtypeStruct((R, C), jnp.float32),
               jnp.asarray(rng.normal(size=(R, RI)).astype(np.float32)),
               jnp.asarray(rng.normal(size=(RI, C)).astype(np.float32)))


if __name__ == "__main__":
    main()
