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
        # program as constants
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
