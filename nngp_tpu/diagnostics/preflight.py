"""Hardware preflight: validate the Pallas sweep kernel against the XLA
path on the *current backend* (VERDICT round-1 item 2).

With the innovation noise zeroed, one chromatic block is the deterministic
mean-field map (mcmc_nngp_update_Gaussian.R:261-274 with the N(0, P^-1)
draw suppressed), so the routed-gather Pallas kernel and the *flat* XLA
schedule must produce the same field from the same state — on real TPU
hardware, not just in interpret mode.  (Flat, not classed: both flat and
the Pallas plan walk colors in color-major order, and within a color the
block order is irrelevant because same-color sites are never moralized
neighbors; the classed schedule interleaves colors across degree classes —
an equally valid Gibbs order, but a different realization.)  The bench runs
this before selecting the pallas schedule and falls back on mismatch.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np


def chromatic_sweep_parity(mc, n_sweeps: int = 2, tol: float = 2e-3):
    """Run `n_sweeps` zero-noise chromatic sweeps of chain 0 through both
    sweep implementations and compare the fields.

    Returns {"max_abs_diff", "rms_diff", "ok", "backend"}.
    """
    from nngp_tpu.api import _device_problem, _get_sweep_plan
    from nngp_tpu.models.gaussian import (
        UpdateConfig,
        _chromatic_sweeps,
        _chromatic_sweeps_pallas,
        _mu_obs,
    )
    from nngp_tpu.ops.covariance import shape_transform
    from nngp_tpu.ops.vecchia import vecchia_linv

    graph, data = _device_problem(mc)
    plan = _get_sweep_plan(mc)
    names = mc.space_time_model["covfun"]["shape_params"]
    cfg = UpdateConfig(
        n_iterations=1,
        shape_names=tuple(names),
        locs_cols=tuple(int(c) for c in mc.design.locs_cols),
        n_chromatic=int(n_sweeps),
        zero_sweep_noise=True,
        chromatic_schedule="flat",
        pallas_interpret=jax.default_backend() != "tpu",
    )
    state0 = jax.tree.map(lambda x: jnp.asarray(x[0]), mc.states)
    key = jax.random.key(0)

    @jax.jit
    def both(state, graph, data, plan):
        # graph/data/plan are jit *arguments*: their gather maps are
        # hundreds of MBs at n=58k and must not be inlined into the
        # program as constants (same fix as mxu_sweep_parity)
        linv = vecchia_linv(graph, shape_transform(list(names), state.shape))
        mu = _mu_obs(data, state, graph)
        f_x = _chromatic_sweeps(graph, data, cfg, state, linv, mu, key).field
        f_p = _chromatic_sweeps_pallas(
            graph, data, replace(cfg, chromatic_schedule="pallas"), state,
            linv, mu, key, plan,
        ).field
        return f_x, f_p

    f_x, f_p = both(state0, graph, data, plan)
    f_x = np.asarray(f_x)
    f_p = np.asarray(f_p)
    scale = max(1.0, float(np.abs(f_x).max()))
    diff = np.abs(f_x - f_p)
    return {
        "max_abs_diff": float(diff.max()),
        "rms_diff": float(np.sqrt(np.mean(diff**2))),
        "rel_tol_used": tol,
        "ok": bool(diff.max() <= tol * scale),
        "backend": jax.default_backend(),
    }


def mxu_sweep_parity(mc, n_sweeps: int = 48, tol: float = 2e-3):
    """Hardware parity check for the MXU one-hot-matmul sweep.

    The MXU schedule visits sites in a (supertile x color) block order —
    a different (equally valid) Gauss-Seidel order than the flat schedule,
    so single-sweep fields differ.  But every chromatic schedule iterates
    the same mean map, whose unique fixed point is the joint conditional
    mean of the field (same oracle as
    tests/test_mxu_sweep.py:test_mxu_sweeps_zero_noise_fixed_point): with
    innovation noise zeroed, `n_sweeps` sweeps of both schedules from the
    same state must converge to the same field.  `flat_residual` (flat at
    n_sweeps vs flat at n_sweeps//2) reports how converged the fixed-point
    iteration itself is, so a routing bug is distinguishable from slow
    Gauss-Seidel convergence.
    """
    from dataclasses import replace as _replace

    from nngp_tpu.api import _device_problem, _get_mxu_plan
    from nngp_tpu.models.gaussian import (
        UpdateConfig,
        _chromatic_sweeps,
        _chromatic_sweeps_mxu,
        _mu_obs,
    )
    from nngp_tpu.ops.covariance import shape_transform
    from nngp_tpu.ops.vecchia import vecchia_linv

    graph, data = _device_problem(mc)
    mplan = _get_mxu_plan(mc)
    names = mc.space_time_model["covfun"]["shape_params"]
    cfg = UpdateConfig(
        n_iterations=1,
        shape_names=tuple(names),
        locs_cols=tuple(int(c) for c in mc.design.locs_cols),
        n_chromatic=int(n_sweeps),
        zero_sweep_noise=True,
        chromatic_schedule="flat",
    )
    state0 = jax.tree.map(lambda x: jnp.asarray(x[0]), mc.states)
    key = jax.random.key(0)

    @jax.jit
    def run_all(state, mplan):
        # mplan is a jit *argument*: its one-hot routing matrices are ~GBs
        # and must not be inlined into the program as constants
        linv = vecchia_linv(graph, shape_transform(list(names), state.shape))
        mu = _mu_obs(data, state, graph)
        # warm-start at the fixed point: 300 classed sweeps (any schedule's
        # zero-noise iteration converges to the same conditional mean), so
        # the comparison below measures arithmetic accuracy, not
        # Gauss-Seidel convergence distance
        warm = _chromatic_sweeps(
            graph, data,
            _replace(cfg, chromatic_schedule="classed", n_chromatic=300),
            state, linv, mu, key,
        )
        state_b = jax.tree.map(lambda x: x[None], warm)
        f_flat = _chromatic_sweeps(graph, data, cfg, warm, linv, mu, key).field
        f_half = _chromatic_sweeps(
            graph, data, _replace(cfg, n_chromatic=n_sweeps // 2), warm,
            linv, mu, key,
        ).field
        f_mxu = _chromatic_sweeps_mxu(
            graph, data, _replace(cfg, chromatic_schedule="mxu"), state_b,
            linv[None], mu[None], key, mplan,
        ).field[0]
        return f_flat, f_half, f_mxu

    f_flat, f_half, f_mxu = (np.asarray(a) for a in run_all(state0, mplan))
    scale = max(1.0, float(np.abs(f_flat).max()))
    diff = np.abs(f_flat - f_mxu)
    flat_residual = float(np.abs(f_flat - f_half).max())
    # the comparison is only meaningful once the fixed-point iteration has
    # converged well below the tolerance: under slow contraction the
    # distance to the limit is ~residual * rho/(1-rho), so folding the
    # residual into the acceptance threshold would self-loosen the gate —
    # report "inconclusive" (ok=False) instead and let the caller raise
    # warm/n_sweeps
    inconclusive = flat_residual > tol * scale
    return {
        "max_abs_diff": float(diff.max()),
        "rms_diff": float(np.sqrt(np.mean(diff**2))),
        "flat_residual": flat_residual,
        "rel_tol_used": tol,
        "inconclusive": bool(inconclusive),
        "ok": bool((not inconclusive)
                   and diff.max() <= tol * scale + flat_residual),
        "backend": jax.default_backend(),
    }
