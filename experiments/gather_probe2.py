#!/usr/bin/env python
"""Probe 2: sublane gather (equal shapes), roll, transpose, dynamic_slice."""
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

R, C = 512, 128
rng = np.random.default_rng(0)
src = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
idx_eq = jnp.asarray(rng.integers(0, R, size=(R, C)).astype(np.int32))
lane_idx = jnp.asarray(rng.integers(0, C, size=(R, C)).astype(np.int32))


def try_kernel(name, kernel, out_shape, *args, reps=100):
    try:
        def kern_rep(*refs):
            def body(i, acc):
                kernel(*refs)
                return acc
            lax.fori_loop(0, reps, body, 0)
        frep = jax.jit(pl.pallas_call(
            kern_rep, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        o = frep(*args); jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(5):
            o = frep(*args)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / 5 / reps
        elems = int(np.prod(out_shape.shape))
        print(f"{name}: OK  {dt*1e6:.2f} us/call  ({dt/elems*1e9:.4f} ns/elt)")
        return True
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}")
        return False


def main():
    print("backend:", jax.default_backend())
    out_sh = jax.ShapeDtypeStruct((R, C), jnp.float32)

    def k_sub(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)
    try_kernel("sublane gather equal-shape", k_sub, out_sh, src, idx_eq)

    def k_lane(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)
    try_kernel("lane gather equal-shape", k_lane, out_sh, src, lane_idx)

    def k_benes(src_ref, a_ref, b_ref, c_ref, out_ref):
        x = jnp.take_along_axis(src_ref[:], a_ref[:], axis=1)
        y = jnp.take_along_axis(x, b_ref[:], axis=0)
        out_ref[:] = jnp.take_along_axis(y, c_ref[:], axis=1)
    try_kernel("3-stage benes route", k_benes, out_sh, src, lane_idx, idx_eq,
               lane_idx)

    def k_roll(src_ref, out_ref):
        out_ref[:] = pltpu.roll(src_ref[:], 3, 0)
    try_kernel("pltpu.roll axis=0", k_roll, out_sh, src)

    def k_tr(src_ref, out_ref):
        out_ref[:] = src_ref[: C, :].T
    try_kernel("transpose 128x128", k_tr,
               jax.ShapeDtypeStruct((C, C), jnp.float32), src)

    # bigger operand: 1024-row index into 4096-row source? (unequal again,
    # but idx rows > src rows failed before; try idx rows < src rows)
    src_big = jnp.asarray(rng.normal(size=(4096, C)).astype(np.float32))
    idx_small = jnp.asarray(rng.integers(0, 4096, size=(512, C)).astype(np.int32))
    def k_sub2(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)
    try_kernel("sublane gather idx<src rows", k_sub2, out_sh, src_big, idx_small)

    # int32 variants of lane gather (for routing index tiles themselves)
    srci = jnp.asarray(rng.integers(0, 99, size=(R, C)).astype(np.int32))
    def k_lanei(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)
    try_kernel("lane gather int32", k_lanei,
               jax.ShapeDtypeStruct((R, C), jnp.int32), srci, lane_idx)


if __name__ == "__main__":
    main()
