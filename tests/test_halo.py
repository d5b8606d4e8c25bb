"""Halo-sharded field mode: parity vs the unsharded kernels on a virtual
4-device CPU 'sites' mesh (docs/scaling.md field-sharding design; SURVEY.md
§5 long-context row).

Both halo kernels walk the same global schedules with the same keys as the
unsharded paths and exchange only static halo index sets via ppermute, so
the results must match to fp-reassociation tolerance (same formula on the
same values)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nngp_tpu.models.gaussian import (
    UpdateConfig,
    _chromatic_sweeps,
    _mu_obs,
    sweep_inputs,
)
from nngp_tpu.ops.trisolve import level_solve
from nngp_tpu.ops.vecchia import vecchia_linv
from nngp_tpu.parallel.halo import (
    SITES_AXIS,
    build_halo_plan,
    halo_chromatic_sweeps,
    halo_level_solve,
    reconcile,
)

from tests.test_gibbs import build_problem, make_state

D = 4


def _mesh():
    return Mesh(np.array(jax.devices()[:D]), (SITES_AXIS,))


def test_halo_level_solve_matches_unsharded(rng):
    g, NN, data, maps = build_problem(rng, n_unique=150, n_obs=220)
    state = make_state(g, 0, rng)
    linv = vecchia_linv(g, jnp.exp(state.shape))
    v = jnp.asarray(rng.normal(size=g.n), jnp.float32)
    ref = np.asarray(level_solve(linv, v, g))

    plan = build_halo_plan(g, D)

    def run(linv_, v_):
        return halo_level_solve(g, plan, linv_, v_)

    out = jax.jit(
        jax.shard_map(run, mesh=_mesh(), in_specs=(P(), P()), out_specs=P())
    )(linv, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-6)


def test_halo_chromatic_sweeps_bit_parity(rng):
    """Same keys => same draws: the halo-sharded sweep must reproduce the
    unsharded classed sweep."""
    g, NN, data, maps = build_problem(rng, n_unique=150, n_obs=220)
    n = g.n
    cfg = UpdateConfig(
        n_iterations=1, shape_names=("log_range",), locs_cols=(),
        n_chromatic=3,
    )
    state = make_state(g, 0, rng)
    linv = vecchia_linv(g, jnp.exp(state.shape))
    mu = _mu_obs(data, state, g)
    key = jax.random.key(7)

    ref = np.asarray(
        jax.jit(
            lambda s, k: _chromatic_sweeps(g, data, cfg, s, linv, mu, k)
        )(state, key).field
    )

    plan = build_halo_plan(g, D)
    pregathered, inv_scale, inv_noise = sweep_inputs(
        g, data, cfg, state, linv, mu
    )
    w0 = jnp.concatenate([state.field, jnp.zeros(1, jnp.float32)])
    owner = jnp.asarray(plan.owner)

    def run(w):
        w = halo_chromatic_sweeps(
            g, plan, w, pregathered, state.beta_0, inv_scale, inv_noise,
            key, cfg.n_chromatic,
        )
        return reconcile(w, owner)

    out = jax.jit(
        jax.shard_map(run, mesh=_mesh(), in_specs=P(), out_specs=P())
    )(w0)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=0, atol=2e-6)


def test_halo_plan_covers_all_sites(rng):
    g, NN, data, maps = build_problem(rng, n_unique=120, n_obs=160)
    plan = build_halo_plan(g, D)
    n = g.n
    owner = np.asarray(plan.owner)
    assert owner.min() >= 0 and owner.max() < D
    # every real site appears exactly once in some device's sweep rows of
    # its class/block
    seen = np.zeros(n, dtype=int)
    for ci, c_sites in enumerate(g.chrom_sites):
        c_sites = np.asarray(c_sites)
        nb, B = c_sites.shape
        rows_tbl = np.asarray(plan.sweep_rows[ci])
        for d in range(D):
            for b in range(nb):
                rows = rows_tbl[d, b]
                rows = rows[rows < B]
                sites = c_sites[b, rows]
                sites = sites[sites < n]
                assert (owner[sites] == d).all()
                seen[sites] += 1
    assert (seen == 1).all()
