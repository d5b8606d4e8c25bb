"""MXU sweep plan + executor tests.

The one-hot chunk matmuls must route every (site, neighbor) element's field
value and Q entry exactly (emulated in f64 NumPy here); the executor must
agree with the other chromatic schedules on the zero-noise fixed point
(all schedules iterate the same Gauss-Seidel mean map, whose unique fixed
point is the joint conditional mean) and sample the exact conditional.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nngp_tpu.preprocess.mxu_sweep import build_mxu_sweep_plan, plan_stats

from tests.test_gibbs import build_problem, make_state


def _colors_of(g):
    colors_idx = np.asarray(g.colors_idx)
    colors = np.zeros(g.n, dtype=np.int64)
    for c in range(colors_idx.shape[0]):
        row = colors_idx[c]
        colors[row[row < g.n]] = c
    return colors


def _emulate_priors(plan, w, q_edges, n, n_edges):
    """NumPy emulation of the chunk-matmul routing (f64, exact)."""
    R = plan.R
    w1 = np.concatenate([w, [0.0]])
    w_store = np.zeros(R + 128)
    w_store[:R] = w1[np.asarray(plan.store_site)]
    q1 = np.concatenate([np.asarray(q_edges), [0.0]])
    out = {}
    for ci in range(len(plan.ncs)):
        G = np.asarray(plan.G[ci], dtype=np.float64)
        M = np.asarray(plan.M[ci], dtype=np.float64)
        eids = np.asarray(plan.eid_rows[ci])
        wins = np.asarray(plan.win_ids[ci])
        sites = np.asarray(plan.sites[ci])
        nb, NC = wins.shape
        for b in range(nb):
            src = w_store[
                (wins[b][:, None] * 128 + np.arange(128)[None]).reshape(-1)
            ].reshape(NC, 128)
            gath = np.einsum("nrk,nk->nr", G[b], src).reshape(-1)
            prod = q1[np.where(eids[b] < n_edges, eids[b], len(q1) - 1)] * gath
            prior = M[b] @ prod
            for i, s in enumerate(sites[b]):
                if s < n:
                    out[int(s)] = prior[i]
    return out


def test_plan_routes_all_nonhot_elements(rng):
    g, NN, data, maps = build_problem(rng, n_unique=400, n_obs=500)
    n = g.n
    colors = _colors_of(g)
    plan = build_mxu_sweep_plan(
        colors, np.asarray(g.nbr_sites), np.asarray(g.nbr_edge),
        np.asarray(g.nbr_mask), np.asarray(g.kernel_coords),
        n_edges=g.n_edges, hot_count=64, supertile=256,
    )
    w = rng.normal(size=n)
    q_edges = rng.normal(size=g.n_edges)
    got = _emulate_priors(plan, w, q_edges, n, g.n_edges)

    nbr_sites = np.asarray(g.nbr_sites)
    nbr_edge = np.asarray(g.nbr_edge)
    nbr_mask = np.asarray(g.nbr_mask) > 0
    q1 = np.concatenate([q_edges, [0.0]])
    hot = set(np.asarray(plan.hot_sites).ravel().tolist()) - {n}
    n_checked = 0
    for s in range(n):
        if s in hot:
            continue
        want = np.sum(q1[nbr_edge[s][nbr_mask[s]]]
                      * w[nbr_sites[s][nbr_mask[s]]])
        assert s in got, f"site {s} missing from matmul blocks"
        np.testing.assert_allclose(got[s], want, rtol=1e-10, atol=1e-10)
        n_checked += 1
    assert n_checked == n - len(hot)
    # hot blocks cover exactly the hot sites, each once
    hs = np.asarray(plan.hot_sites).ravel()
    hs = hs[hs < n]
    assert len(set(hs.tolist())) == len(hs) == len(hot)


def test_mxu_sweeps_zero_noise_fixed_point(rng):
    """50 zero-noise sweeps of mxu and flat schedules converge to the same
    joint conditional mean (unique Gauss-Seidel fixed point)."""
    from nngp_tpu.models.gaussian import (
        UpdateConfig, _chromatic_sweeps, _chromatic_sweeps_mxu, _mu_obs,
    )
    from nngp_tpu.ops.vecchia import vecchia_linv

    g, NN, data, maps = build_problem(rng, n_unique=300, n_obs=400)
    n = g.n
    colors = _colors_of(g)
    mplan = build_mxu_sweep_plan(
        colors, np.asarray(g.nbr_sites), np.asarray(g.nbr_edge),
        np.asarray(g.nbr_mask), np.asarray(g.kernel_coords),
        n_edges=g.n_edges, hot_count=64, supertile=256,
    )
    cfg = UpdateConfig(
        n_iterations=1, shape_names=("log_range",), locs_cols=(),
        n_chromatic=50, zero_sweep_noise=True,
    )
    from dataclasses import replace

    # two chains with distinct states: each chain's fixed point must match
    # its own per-chain flat-schedule run (catches cross-chain mixing)
    states = [make_state(g, 0, rng, beta_0=0.7, log_scale=0.3),
              make_state(g, 0, rng, beta_0=-0.4, log_scale=0.8)]
    linvs = [vecchia_linv(g, jnp.exp(s.shape)) for s in states]
    mus = [_mu_obs(data, s, g) for s in states]
    key = jax.random.key(3)

    refs = [
        np.asarray(
            jax.jit(lambda s, lv, mu: _chromatic_sweeps(
                g, data, replace(cfg, chromatic_schedule="flat"), s, lv, mu,
                key,
            ))(s, lv, mu).field
        )
        for s, lv, mu in zip(states, linvs, mus)
    ]
    states_b = jax.tree.map(lambda *x: jnp.stack(x), *states)
    out = jax.jit(lambda sb: _chromatic_sweeps_mxu(
        g, data, cfg, sb, jnp.stack(linvs), jnp.stack(mus), key, mplan
    ))(states_b)
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(out.field[c]), refs[c], rtol=2e-4, atol=2e-4
        )


def test_mxu_sweeps_exact_conditional(rng):
    """With noise on, iterated mxu sweeps sample the exact Gaussian
    conditional of the field (dense oracle, as for the classed path)."""
    from nngp_tpu.models.gaussian import (
        UpdateConfig, _chromatic_sweeps_mxu, _mu_obs,
    )
    from nngp_tpu.ops.vecchia import vecchia_linv
    from tests.test_gibbs import dense_Q

    g, NN, data, maps = build_problem(rng, n_unique=100, n_obs=170)
    n = g.n
    colors = _colors_of(g)
    mplan = build_mxu_sweep_plan(
        colors, np.asarray(g.nbr_sites), np.asarray(g.nbr_edge),
        np.asarray(g.nbr_mask), np.asarray(g.kernel_coords),
        n_edges=g.n_edges, hot_count=32, supertile=128,
    )
    cfg = UpdateConfig(
        n_iterations=1, shape_names=("log_range",), locs_cols=(),
        n_chromatic=3,
    )
    state = make_state(g, 0, rng)
    linv = vecchia_linv(g, jnp.exp(state.shape))
    mu = _mu_obs(data, state, g)

    step = jax.jit(lambda sb, k: _chromatic_sweeps_mxu(
        g, data, cfg, sb, linv[None], mu[None], k, mplan
    ))
    key = jax.random.key(0)
    n_draws = 1500
    fields = np.zeros((n_draws, n))
    sb = jax.tree.map(lambda x: jnp.asarray(x)[None], state)
    for t in range(n_draws):
        sb = step(sb, jax.random.fold_in(key, t))
        fields[t] = np.asarray(sb.field[0])
    fields = fields[200:]

    Q = dense_Q(linv, NN, n)
    ls = float(state.log_scale)
    lnv = float(state.log_noise_variance)
    b0 = float(state.beta_0)
    D = np.asarray(g.obs_per_loc, dtype=np.float64)
    M_t_r = np.zeros(n)
    np.add.at(M_t_r, np.asarray(g.locs_match), np.asarray(data.y - mu) + 0.0)
    P = Q * np.exp(-ls) + np.diag(D) * np.exp(-lnv)
    mean = np.linalg.solve(
        P, np.exp(-ls) * Q @ (b0 * np.ones(n)) + np.exp(-lnv) * (M_t_r + D * b0)
    )
    cov = np.linalg.inv(P)
    sd = np.sqrt(np.diag(cov))
    emp_mean = fields.mean(0)
    emp_sd = fields.std(0)
    assert np.abs(emp_mean - mean).max() < 6 * sd.max() / np.sqrt(200)
    assert np.abs(emp_sd / sd - 1).max() < 0.25


def test_mxu_parity_preflight_cpu():
    """The bench's MXU hardware parity preflight
    (diagnostics/preflight.py:mxu_sweep_parity) on the CPU backend: the
    one-hot matmul sweep must reach the flat schedule's zero-noise fixed
    point to routing-arithmetic accuracy."""
    import nngp_tpu
    from nngp_tpu.diagnostics.preflight import mxu_sweep_parity

    rng = np.random.default_rng(3)
    locs = rng.uniform(size=(350, 2))
    y = rng.normal(size=350)
    mc = nngp_tpu.initialize(
        locs, y, m=4, n_chains=2, seed=3,
        stationary_covfun="exponential_isotropic",
    )
    out = mxu_sweep_parity(mc)
    assert out["ok"], out
    assert out["max_abs_diff"] < 1e-2, out
