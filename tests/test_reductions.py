"""Compensated reductions + precision-preserving factor build.

Regression tests for the round-3 Heavy-metals convergence fix
(experiments/ratio_audit_*.json): f32 MH log-ratios must match a float64
oracle to ~1e-3 at scale, and the Vecchia factor built from f64-precomputed
neighbor distances must be free of f32 coordinate cancellation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nngp_tpu.ops.reductions import df_sum, pairwise_df_sum, two_sum


def test_two_sum_error_free():
    a = jnp.float32(1e8)
    b = jnp.float32(3.14159)
    s, e = two_sum(a, b)
    assert float(np.float64(s) + np.float64(e)) == pytest.approx(
        1e8 + np.float64(np.float32(3.14159)), abs=0
    )


@pytest.mark.parametrize("n", [1, 2, 3, 1000, 58097])
def test_pairwise_df_sum_matches_f64(n):
    rng = np.random.default_rng(n)
    x = (rng.normal(size=n) + 1.0).astype(np.float32)
    exact = np.sum(x.astype(np.float64))
    hi, lo = jax.jit(pairwise_df_sum)(jnp.asarray(x))
    got = np.float64(hi) + np.float64(lo)
    # error at the f32-ulp-of-total level, NOT O(eps * n * total)
    assert abs(got - exact) <= 4 * np.finfo(np.float32).eps * abs(exact)
    naive = float(jnp.sum(jnp.asarray(x)))
    if n >= 58097:  # the naive sum is measurably worse at HM scale
        assert abs(got - exact) < abs(naive - exact)


def test_df_sum_empty():
    assert float(df_sum(jnp.zeros(0, jnp.float32))) == 0.0


def _toy_fit(n=1500, seed=0, covfun="exponential_isotropic"):
    import nngp_tpu

    rng = np.random.default_rng(seed)
    locs = rng.uniform(0, 60, size=(n, 2))
    y = rng.normal(size=n)
    return nngp_tpu.initialize(locs, y, m=5, stationary_covfun=covfun,
                               n_chains=1, seed=seed)


def test_vecchia_linv_uses_f64_distances():
    """Adversarial sphere geometry: sites clustered within ~100 m so f32
    coordinate differencing would lose ~4 digits; the nn_dist2 path must
    match the float64 oracle built from f64 coordinates."""
    import nngp_tpu
    from nngp_tpu.ops.numpy_ref import np_vecchia_linv
    from nngp_tpu.ops.vecchia import vecchia_linv
    from nngp_tpu.preprocess.ordering import lonlat_to_xyz

    rng = np.random.default_rng(3)
    n = 400
    locs = np.stack([
        -100.0 + 1e-3 * rng.normal(size=n),
        40.0 + 1e-3 * rng.normal(size=n),
    ], axis=1)
    y = rng.normal(size=n)
    mc = nngp_tpu.initialize(locs, y, m=5,
                             stationary_covfun="exponential_sphere",
                             n_chains=1, seed=0)
    natural = np.array([2e-5])  # range comparable to the cluster extent
    got = np.asarray(vecchia_linv(mc.graph, jnp.asarray(natural, jnp.float32)))
    coords64 = lonlat_to_xyz(np.asarray(mc.locs, np.float64))
    want = np_vecchia_linv(coords64, mc.NNarray, "exponential_sphere", natural)
    # log-diagonal agreement is what the sufficient MH ratio consumes
    logd = np.log(got[:, 0]) - np.log(want[:, 0])
    assert np.abs(logd).max() < 1e-3, np.abs(logd).max()


def test_nngp_loglik_diff_matches_f64_oracle():
    from nngp_tpu.ops.numpy_ref import np_sparse_L, np_vecchia_linv
    from nngp_tpu.ops.vecchia import nngp_loglik_diff, vecchia_linv

    mc = _toy_fit(n=1500)
    g = mc.graph
    rng = np.random.default_rng(1)
    field = rng.normal(size=g.n)
    ls_old, ls_new = 0.3, 0.45
    nat_old, nat_new = np.array([4.0]), np.array([5.0])

    def f64_ll(nat, ls):
        linv = np_vecchia_linv(np.asarray(mc.locs, np.float64), mc.NNarray,
                               g.covfun, nat)
        z = np_sparse_L(linv, mc.NNarray) @ field
        return (np.sum(np.log(linv[:, 0])) - 0.5 * g.n * ls
                - 0.5 * (z @ z) * np.exp(-ls))

    want = f64_ll(nat_new, ls_new) - f64_ll(nat_old, ls_old)
    linv_old = vecchia_linv(g, jnp.asarray(nat_old, jnp.float32))
    linv_new = vecchia_linv(g, jnp.asarray(nat_new, jnp.float32))
    got = float(nngp_loglik_diff(
        linv_new, jnp.float32(ls_new), linv_old, jnp.float32(ls_old),
        jnp.asarray(field, jnp.float32), g,
    ))
    assert got == pytest.approx(want, abs=5e-3), (got, want)


def test_obs_sse_diff_matches_f64_oracle():
    from nngp_tpu.models.gaussian import _obs_sse_diff

    mc = _toy_fit(n=2000)
    g, data = mc.graph, mc.data
    rng = np.random.default_rng(2)
    f_old = rng.normal(size=g.n) * 2.0
    f_new = f_old + 0.1 * rng.normal(size=g.n)
    mu = np.full(g.n_obs, 0.7)
    b0 = 0.7
    lm = np.asarray(g.locs_match)
    y64 = np.asarray(mc.observed_field, np.float64)

    def sse64(f):
        r = y64 - f[lm] - mu + b0
        return r @ r

    want = sse64(f_new) - sse64(f_old)
    got = float(_obs_sse_diff(
        data, jnp.asarray(f_new, jnp.float32), jnp.asarray(f_old, jnp.float32),
        jnp.asarray(mu, jnp.float32), jnp.float32(b0), g,
    ))
    assert got == pytest.approx(want, abs=max(1e-4 * abs(want), 2e-2))
