"""Pallas TPU kernel: all chromatic Gibbs sweeps of one iteration, with the
latent field resident in VMEM.

Replaces the XLA gather/scatter loop of models/gaussian._chromatic_sweeps
(reference semantics: mcmc_nngp_update_Gaussian.R:254-275).  The XLA path
pays ~10-60 ns per irregularly gathered element from HBM; here every
gather is routed through Mosaic's native lane gather (chunked to its
128-lane limit) + one transpose (see preprocess/sweep_plan.py for the
routing construction), the field and its K transposed copies never leave
VMEM across the sweeps, and the scatter-back is a masked contiguous row
store (color-major storage).

Grid = (chains, n_sweeps, n_blocks), executed sequentially on the TPU.  A
custom_vmap rule maps a chains batch axis to the leading grid dimension
explicitly (Pallas' generic vmap rule would silently renumber the program
ids this kernel depends on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_idx(k: int, start, shape):
    """Lane-gather index tile realizing the diagonal column mapping:
    rolled[r, g] = block[r, (g - k*(start+r)) % 128]."""
    rows = lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = lax.broadcasted_iota(jnp.int32, shape, 1)
    return jnp.remainder(lanes - k * (start + rows), 128)


def _refresh_transposed(src, tdst_ref, K: int, start):
    """tdst_ref[k][:, start + r] = roll_k(src)[r, :] for one 128-row chunk."""
    for k in range(K):
        idx = _roll_idx(k, start, src.shape)
        rolled = jnp.take_along_axis(src, idx, axis=1)
        tdst_ref[k, :, pl.ds(start, src.shape[0])] = rolled.T


def _make_kernel(plan, n_sweeps: int):
    K, L, NC, G, R = plan.K, plan.L, plan.NC, plan.G, plan.R

    def kernel(
        w_in, I1, I3, sel, q_nat, Mseg, P_nat, rs_nat,
        wmask, noise, row0_s, scal_s, alab_s,
        w_out,
        wT,
    ):
        c = pl.program_id(0)
        s = pl.program_id(1)
        b = pl.program_id(2)
        first = (s == 0) & (b == 0)

        @pl.when(first)
        def _init():
            w_out[0] = w_in[0]
            for r0 in range(0, R, 128):
                _refresh_transposed(w_out[0, r0 : r0 + 128, :], wT, K, r0)

        beta0 = scal_s[c, 0]
        inv_scale = scal_s[c, 1]
        inv_noise = scal_s[c, 2]
        r0 = row0_s[b, 0]

        # routed gather of field values into the transit layout
        # [L rows, 128 site-lanes]: per copy, NC chunked [128,128] lane
        # gathers from the transposed field -> transpose -> one lane gather
        # rearranging each transit row onto site lanes
        g = jnp.zeros((L, 128), dtype=w_out.dtype)
        for k in range(K):
            chunks = []
            for ci in range(NC):
                a0 = pl.multiple_of(alab_s[b, ci] * 128, 128)
                src = wT[k, :, pl.ds(a0, 128)]               # [128, 128]
                chunks.append(
                    jnp.take_along_axis(src, I1[0, k, ci], axis=1)
                )
            A = jnp.concatenate(chunks, axis=1)              # [128, L]
            gk = jnp.take_along_axis(A.T, I3[0, k], axis=1)  # [L, 128]
            g = jnp.where(sel[0] == k, gk, g)

        # conditional mean/precision per site (ref :264-271); the transit
        # row -> site-group reduction is one f32 MXU matmul against the
        # static 0/1 matrix M (which also encodes the row permutation).
        # precision=HIGHEST: the MXU's default single-pass bf16 rounding
        # loses ~3 decimal digits of the gathered field values — enough to
        # fail the on-hardware parity preflight (interpret mode hides this).
        prod = q_nat[0, 0] * (g - beta0)
        prior = jnp.dot(Mseg[0], prod, preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
        P = P_nat[0, 0]
        mean = beta0 - (inv_scale * prior - inv_noise * rs_nat[0, 0]) / P
        val = mean + noise[0, 0, 0] * lax.rsqrt(P)

        # masked contiguous scatter-back + transposed-copy refresh of the
        # one or two 128-row aligned windows covering the block
        old = w_out[0, pl.ds(r0, G), :]
        new = jnp.where(wmask[0] > 0, val, old)
        w_out[0, pl.ds(r0, G), :] = new
        start0 = (r0 // 128) * 128
        for wi in range(-(-G // 128) + 1):
            off = wi * 128

            @pl.when(start0 + off < r0 + G)
            def _refresh(off=off):
                start = pl.multiple_of(
                    jnp.minimum(start0 + off, R - 128), 128
                )
                blk = w_out[0, pl.ds(start, 128), :]
                _refresh_transposed(blk, wT, K, start)

    return kernel


def _pallas_sweeps_call(plan, n_sweeps: int, C: int, interpret: bool):
    """pallas_call over grid (C, n_sweeps, NB); all per-chain inputs carry a
    leading C axis."""
    K, L, NC, G, R, NB = plan.K, plan.L, plan.NC, plan.G, plan.R, plan.n_blocks

    c_ = lambda c, s, b: c
    s_ = lambda c, s, b: s
    b_ = lambda c, s, b: b
    z_ = lambda c, s, b: 0

    def vspec(shape, *fns):
        return pl.BlockSpec(
            shape, lambda c, s, b: tuple(f(c, s, b) for f in fns),
            memory_space=pltpu.VMEM,
        )

    def sspec(shape, *fns):
        return pl.BlockSpec(
            shape, lambda c, s, b: tuple(f(c, s, b) for f in fns),
            memory_space=pltpu.SMEM,
        )

    grid = (C, n_sweeps, NB)
    in_specs = [
            vspec((1, R, 128), c_, z_, z_),              # w_in
            vspec((1, K, NC, 128, 128), b_, z_, z_, z_, z_),  # I1
            vspec((1, K, L, 128), b_, z_, z_, z_),       # I3
            vspec((1, L, 128), b_, z_, z_),              # sel
            vspec((1, 1, L, 128), c_, b_, z_, z_),       # q_nat
            vspec((1, G, L), b_, z_, z_),                # Mseg
            vspec((1, 1, G, 128), c_, b_, z_, z_),       # P_nat
            vspec((1, 1, G, 128), c_, b_, z_, z_),       # rs_nat
            vspec((1, G, 128), b_, z_, z_),              # wmask
            vspec((1, 1, 1, G, 128), c_, s_, b_, z_, z_),  # noise
            sspec((NB, 1), z_, z_),                      # row0 (full)
            sspec((C, 3), z_, z_),                       # scal (full)
            sspec((NB, NC), z_, z_),                     # a_label (full)
    ]
    out_specs = vspec((1, R, 128), c_, z_, z_)

    raw = pl.pallas_call(
        _make_kernel(plan, n_sweeps),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((C, R, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, 128, R), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
        ),
        interpret=interpret,
    )

    def call(w, q_nat, P_nat, rs_nat, noise, scal, I1, I3, sel, M, wmask,
             row0, a_label):
        return raw(w, I1, I3, sel, q_nat, M, P_nat, rs_nat, wmask, noise,
                   row0, scal, a_label)

    return call


def make_pallas_sweeps(plan, n_sweeps: int, interpret: bool = False):
    """Sweep executor with explicit chains batching.

    Returns fn(w [R,128] f32, q_nat [NB,L,128], P_nat [NB,G,128],
    rs_nat [NB,G,128], noise [S,NB,G,128], scal [3]) -> w' [R,128];
    vmapping over a leading chains axis on the per-chain arguments maps to
    the kernel's leading grid dimension.  ``plan`` provides only the static
    meta here; its array leaves are passed as explicit (unbatched)
    arguments so tracing stays clean under jit/scan/vmap.
    """
    meta = plan
    n_per_chain = 6  # w, q_nat, P_nat, rs_nat, noise, scal

    @jax.custom_batching.custom_vmap
    def sweeps(w, q_nat, P_nat, rs_nat, noise, scal, *tiles):
        run = _pallas_sweeps_call(meta, n_sweeps, 1, interpret)
        out = run(
            w[None], q_nat[None], P_nat[None], rs_nat[None], noise[None],
            scal[None], *tiles,
        )
        return out[0]

    @sweeps.def_vmap
    def _rule(axis_size, in_batched, *args):
        per_chain = [
            a if bt else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, bt in zip(args[:n_per_chain], in_batched[:n_per_chain])
        ]
        tiles = args[n_per_chain:]
        run = _pallas_sweeps_call(meta, n_sweeps, axis_size, interpret)
        return run(*per_chain, *tiles), True

    def wrapped(w, q_nat, P_nat, rs_nat, noise, scal):
        if w.dtype != jnp.float32:
            raise TypeError(
                "pallas sweep kernel supports float32 fields only "
                f"(got {w.dtype}); use chromatic_schedule='classed' for "
                "other dtypes"
            )
        return sweeps(
            w, q_nat, P_nat, rs_nat, noise, scal,
            plan.I1, plan.I3, plan.sel, plan.M, plan.wmask, plan.row0,
            plan.a_label,
        )

    return wrapped
