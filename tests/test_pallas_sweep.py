"""Tests for the routed-gather sweep plan and Pallas kernel (interpret mode).

The plan (preprocess/sweep_plan.py) must route every (site, neighbor)
element's field value and Q entry to its natural position; the kernel
(ops/pallas_sweep.py) must reproduce the XLA chromatic sweep exactly when
the injected noise is zero (within-color update order is irrelevant for
Gauss-Seidel on a proper coloring, so flat-XLA and Pallas orders agree).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nngp_tpu
from nngp_tpu.models.gaussian import (
    UpdateConfig,
    _chromatic_sweeps,
    _chromatic_sweeps_pallas,
    _mu_obs,
    _natural_shape,
)
from nngp_tpu.ops.vecchia import precision_diag_and_q_edges, vecchia_linv
from nngp_tpu.preprocess.sweep_plan import build_sweep_plan


def _toy_mc(n=400, seed=0, n_chains=1):
    rng = np.random.default_rng(seed)
    locs = rng.uniform(size=(n, 2))
    y = rng.normal(size=n)
    return nngp_tpu.initialize(
        locs, y, m=4, n_chains=n_chains, seed=seed,
        stationary_covfun="exponential_isotropic",
    )


def _colors_from_graph(g):
    colors_idx = np.asarray(g.colors_idx)
    colors = np.zeros(g.n, dtype=np.int64)
    for c in range(colors_idx.shape[0]):
        row = colors_idx[c]
        colors[row[row < g.n]] = c
    return colors


def _emulate_routed_gather(plan, w_flat, q_flat):
    """NumPy emulation of the kernel's chunked routed field gather; the Q
    values are gathered XLA-side in production (edge_nat), emulated the
    same way here."""
    R, L, NC, K, NB = plan.R, plan.L, plan.NC, plan.K, plan.n_blocks
    w2 = w_flat.reshape(R, 128)

    def transposed(src, k):
        rows = np.arange(src.shape[0])[:, None]
        lanes = np.arange(128)[None, :]
        rolled = np.take_along_axis(src, (lanes - k * rows) % 128, axis=1)
        return rolled.T  # [128, rows]

    wT = [transposed(w2, k) for k in range(K)]
    I1 = np.asarray(plan.I1)
    alab = np.asarray(plan.a_label)
    g = np.zeros((NB, L, 128))
    for b in range(NB):
        for k in range(K):
            chunks = []
            for ci in range(NC):
                a0 = alab[b, ci] * 128
                src = wT[k][:, a0 : a0 + 128]
                chunks.append(np.take_along_axis(src, I1[b, k, ci], axis=1))
            A = np.concatenate(chunks, axis=1)
            gk = np.take_along_axis(A.T, np.asarray(plan.I3)[b, k], axis=1)
            g[b] = np.where(np.asarray(plan.sel)[b] == k, gk, g[b])
    qv = q_flat[np.asarray(plan.edge_nat)]
    return g, qv * np.asarray(plan.qsign_nat)


def test_plan_routes_field_and_q_values():
    mc = _toy_mc()
    g = mc.graph
    colors = _colors_from_graph(g)
    plan = build_sweep_plan(
        colors, np.asarray(g.nbr_sites), np.asarray(g.nbr_edge),
        np.asarray(g.nbr_mask), n_edges=g.n_edges, L_max=512, G=16, K=2,
    )
    rng = np.random.default_rng(1)
    n = g.n
    field = rng.normal(size=n)
    q_edges = rng.normal(size=g.n_edges)

    field1 = np.concatenate([field, [0.0]])
    w_flat = field1[np.asarray(plan.flat_site)]
    q_flat = np.concatenate([q_edges, [0.0]])
    gv, qv = _emulate_routed_gather(plan, w_flat, q_flat)

    # per-site reduction against a direct neighbor-list computation
    prior = np.einsum("bgu,bul->bgl", np.asarray(plan.M), qv * gv)
    nbr_sites = np.asarray(g.nbr_sites)
    nbr_edge = np.asarray(g.nbr_edge)
    nbr_mask = np.asarray(g.nbr_mask).astype(bool)
    q1 = np.concatenate([q_edges, [0.0]])
    expected = np.zeros(n)
    for s in range(n):
        nb = nbr_sites[s][nbr_mask[s]]
        ed = nbr_edge[s][nbr_mask[s]]
        expected[s] = np.sum(q1[ed] * field[nb])
    sites = np.asarray(plan.sites_nat)
    wm = np.asarray(plan.wmask) > 0
    got = prior[wm]
    want = expected[sites[wm]]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_pallas_sweeps_match_flat_xla_zero_noise(monkeypatch):
    mc = _toy_mc()
    g, data = mc.graph, mc.data
    state = jax.tree.map(lambda x: jnp.asarray(x)[0], mc.states)
    names = tuple(mc.space_time_model["covfun"]["shape_params"])
    cfg_flat = UpdateConfig(
        n_iterations=1, shape_names=names, locs_cols=(), n_chromatic=3,
        chromatic_schedule="flat",
    )
    cfg_pal = UpdateConfig(
        n_iterations=1, shape_names=names, locs_cols=(), n_chromatic=3,
        chromatic_schedule="pallas", pallas_interpret=True,
    )
    colors = _colors_from_graph(g)
    plan = build_sweep_plan(
        colors, np.asarray(g.nbr_sites), np.asarray(g.nbr_edge),
        np.asarray(g.nbr_mask), n_edges=g.n_edges, L_max=512, G=16, K=2,
    )
    linv = vecchia_linv(g, _natural_shape(cfg_flat, state.shape))
    mu = _mu_obs(data, state, g)
    key = jax.random.key(7)

    real_normal = jax.random.normal

    def zero_normal(key, shape=(), dtype=jnp.float32, **kw):
        return jnp.zeros(shape, dtype=dtype)

    monkeypatch.setattr(jax.random, "normal", zero_normal)
    try:
        out_flat = _chromatic_sweeps(g, data, cfg_flat, state, linv, mu, key)
        out_pal = _chromatic_sweeps_pallas(
            g, data, cfg_pal, state, linv, mu, key, plan
        )
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)

    np.testing.assert_allclose(
        np.asarray(out_pal.field), np.asarray(out_flat.field),
        rtol=2e-5, atol=2e-5,
    )


def test_pallas_schedule_end_to_end():
    mc = _toy_mc(n=300, n_chains=2)
    mc = nngp_tpu.run(
        mc, n_cycles=1, n_iterations_update=25, verbose=False,
        chromatic_schedule="pallas", Gelman_Rubin_Brooks_stop=(0.0, 0.0),
    )
    f = np.asarray(mc.states.field)
    assert np.all(np.isfinite(f))
    assert mc.iterations == 25


def test_parity_preflight_interpret():
    """The bench's hardware parity preflight (diagnostics/preflight.py) in
    interpret mode: pallas must match the flat XLA schedule to fp noise."""
    from nngp_tpu.diagnostics.preflight import chromatic_sweep_parity

    mc = _toy_mc(n=350, n_chains=2)
    out = chromatic_sweep_parity(mc)
    assert out["ok"], out
    assert out["max_abs_diff"] < 1e-4
