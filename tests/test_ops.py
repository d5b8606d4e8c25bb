"""Kernel tests against dense-math oracles (SURVEY.md §4 prescription)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.special

from nngp_tpu.preprocess.dedupe import dedupe_and_match
from nngp_tpu.preprocess.graph import build_graph
from nngp_tpu.ops.bessel import kv
from nngp_tpu.ops.covariance import correlation_fn, shape_param_names, shape_transform
from nngp_tpu.ops.vecchia import (
    vecchia_linv,
    linv_mult,
    linv_t_mult,
    precision_diag_and_q_edges,
    nngp_loglik,
)
from nngp_tpu.ops.trisolve import level_solve


def make_graph(rng, n=50, m=6, covfun="exponential_isotropic", d=2):
    locs = rng.normal(size=(n, d))
    if "sphere" in covfun:
        locs = np.stack(
            [rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)], axis=1
        )
    maps = dedupe_and_match(locs, perm_fn=lambda L: np.arange(len(L)))
    g, NN = build_graph(maps, m=m, covfun=covfun)
    return g, NN, maps.locs


def dense_corr(g, natural_shape):
    """Dense correlation matrix via the same correlation_fn (oracle for the
    conditional algebra, not for the kernel formulas)."""
    corr = correlation_fn(g.covfun)
    coords = np.asarray(g.kernel_coords)
    return np.asarray(corr(coords[None, :, :], jnp.asarray(natural_shape))[0])


def linv_to_dense(linv, NN, n):
    L = np.zeros((n, n))
    linv = np.asarray(linv)
    for i in range(n):
        for j, col in enumerate(NN[i]):
            if col >= 0:
                L[i, col] = linv[i, j]
    return L


def test_kv_against_scipy(rng):
    nu = rng.uniform(0.05, 3.4, 500)
    x = np.exp(rng.uniform(np.log(1e-3), np.log(60), 500)).astype(np.float32)
    ours = np.asarray(kv(nu.astype(np.float32), x))
    ref = scipy.special.kv(nu, x.astype(np.float64))
    rel = np.abs(ours - ref) / np.abs(ref)
    assert np.nanmax(rel) < 5e-4


@pytest.mark.parametrize(
    "covfun,d",
    [
        ("exponential_isotropic", 2),
        ("exponential_sphere", 2),
        ("exponential_scaledim", 3),
        ("exponential_spacetime", 3),
        ("matern_isotropic", 2),
        ("matern_sphere", 2),
        ("matern_scaledim", 2),
        ("matern_spacetime", 3),
    ],
)
def test_correlation_families(covfun, d, rng):
    """Check each family against a direct scipy-based evaluation."""
    n = 12
    if "sphere" in covfun:
        raw = np.stack([rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)], 1)
        from nngp_tpu.preprocess.ordering import lonlat_to_xyz

        coords = lonlat_to_xyz(raw)
    else:
        coords = rng.normal(size=(n, d))
    names = shape_param_names(covfun, d)
    sampled = rng.normal(size=len(names)) * 0.3
    natural = np.asarray(shape_transform(names, jnp.asarray(sampled)))
    corr = correlation_fn(covfun)
    K = np.asarray(corr(jnp.asarray(coords, jnp.float32)[None], jnp.asarray(natural, jnp.float32))[0])
    # oracle
    kind = covfun.split("_", 1)[1]
    x = np.asarray(coords, dtype=np.float64)
    if kind in ("isotropic", "sphere"):
        scaled = x / natural[0]
        nu = natural[1] if covfun.startswith("matern") else None
    elif kind == "scaledim":
        nd = x.shape[1]
        scaled = x / natural[:nd]
        nu = natural[nd] if covfun.startswith("matern") else None
    else:
        r = np.concatenate([np.full(x.shape[1] - 1, natural[0]), [natural[1]]])
        scaled = x / r
        nu = natural[2] if covfun.startswith("matern") else None
    dmat = np.sqrt(((scaled[:, None] - scaled[None]) ** 2).sum(-1))
    if covfun.startswith("matern"):
        with np.errstate(invalid="ignore"):
            ref = (
                2 ** (1 - nu)
                / scipy.special.gamma(nu)
                * dmat**nu
                * scipy.special.kv(nu, dmat)
            )
        ref[dmat == 0] = 1.0
    else:
        ref = np.exp(-dmat)
    assert np.abs(K - ref).max() < 5e-4
    # diagonal exactly 1
    assert np.allclose(np.diag(K), 1.0, atol=1e-5)


def test_vecchia_linv_full_conditioning_inverts_cov(rng):
    """With m = n-1 the Vecchia factor is exact: L'L = K^-1."""
    g, NN, locs = make_graph(rng, n=18, m=17)
    shape = jnp.asarray([0.9])
    linv = vecchia_linv(g, shape)
    L = linv_to_dense(linv, NN, 18)
    K = dense_corr(g, [0.9])
    assert np.abs(L.T @ L - np.linalg.inv(K)).max() < 5e-3


def test_vecchia_linv_rows_match_conditionals(rng):
    """Each row encodes N(x_i | parents) of the dense kernel."""
    g, NN, locs = make_graph(rng, n=40, m=5, covfun="matern_isotropic")
    natural = jnp.asarray([0.8, 0.75])
    linv = np.asarray(vecchia_linv(g, natural))
    K = dense_corr(g, [0.8, 0.75])
    for i in range(40):
        nb = NN[i, 1:]
        nb = nb[nb >= 0]
        if len(nb) == 0:
            assert abs(linv[i, 0] - 1.0) < 1e-4
            continue
        Knn = K[np.ix_(nb, nb)]
        kni = K[nb, i]
        b = np.linalg.solve(Knn, kni)
        d = K[i, i] - kni @ b
        assert abs(linv[i, 0] - 1 / np.sqrt(d)) < 1e-3
        assert np.abs(linv[i, 1 : 1 + len(nb)] - (-b / np.sqrt(d))).max() < 1e-3


def test_linv_mult_and_transpose(rng):
    g, NN, _ = make_graph(rng, n=60, m=6)
    linv = vecchia_linv(g, jnp.asarray([0.5]))
    L = linv_to_dense(linv, NN, 60)
    x = rng.normal(size=60).astype(np.float32)
    got = np.asarray(linv_mult(jnp.asarray(linv), jnp.asarray(x), g))
    assert np.abs(got - L @ x).max() < 1e-4
    got_t = np.asarray(linv_t_mult(jnp.asarray(linv), jnp.asarray(x), g))
    assert np.abs(got_t - L.T @ x).max() < 1e-4
    # multi-column
    X = rng.normal(size=(60, 3)).astype(np.float32)
    gotX = np.asarray(linv_mult(jnp.asarray(linv), jnp.asarray(X), g))
    assert np.abs(gotX - L @ X).max() < 1e-4


def test_precision_diag_and_q_edges(rng):
    g, NN, _ = make_graph(rng, n=70, m=5)
    linv = vecchia_linv(g, jnp.asarray([0.7]))
    L = linv_to_dense(linv, NN, 70)
    Q = L.T @ L
    pdiag, q_edges = precision_diag_and_q_edges(linv, g)
    assert np.abs(np.asarray(pdiag) - np.diag(Q)).max() < 1e-4
    # check edge values through the per-site neighbor map
    nbr_sites = np.asarray(g.nbr_sites)
    nbr_edge = np.asarray(g.nbr_edge)
    nbr_mask = np.asarray(g.nbr_mask) > 0
    qe = np.asarray(q_edges)
    for i in range(70):
        for j, e, ok in zip(nbr_sites[i], nbr_edge[i], nbr_mask[i]):
            if ok:
                assert abs(qe[e] - Q[i, j]) < 1e-4


def test_nngp_loglik_matches_dense_gaussian(rng):
    g, NN, _ = make_graph(rng, n=20, m=19)  # exact Vecchia
    log_scale = 0.4
    linv = vecchia_linv(g, jnp.asarray([0.8]))
    field = rng.normal(size=20).astype(np.float32)
    got = float(nngp_loglik(linv, jnp.asarray(field), g, log_scale))
    K = dense_corr(g, [0.8]) * np.exp(log_scale)
    sign, logdet = np.linalg.slogdet(K)
    ref = -0.5 * logdet - 0.5 * field @ np.linalg.solve(K, field)
    # reference drops the -n/2 log(2 pi) constant (update_Gaussian.R:11)
    assert abs(got - ref) < 1e-2


def test_level_solve_matches_dense(rng):
    g, NN, _ = make_graph(rng, n=90, m=6)
    linv = vecchia_linv(g, jnp.asarray([0.6]))
    L = linv_to_dense(linv, NN, 90)
    v = rng.normal(size=90).astype(np.float32)
    got = np.asarray(level_solve(linv, jnp.asarray(v), g))
    ref = np.linalg.solve(L, v)
    assert np.abs(got - ref).max() < 1e-3


def test_level_solve_tight_schedule_matches_blocked(rng):
    """The segment-classed fast path (level_segs) is bit-identical math to
    the fori_loop blocked fallback, and the schedule is a valid padded
    cover of all sites with rows in non-decreasing level order."""
    import dataclasses

    from nngp_tpu.preprocess.coloring import dag_levels, level_segments

    g, NN, _ = make_graph(rng, n=257, m=5)
    linv = vecchia_linv(g, jnp.asarray([0.4]))
    v = rng.normal(size=257).astype(np.float32)
    fast = np.asarray(level_solve(linv, jnp.asarray(v), g))
    g_fallback = dataclasses.replace(g, level_segs=())
    slow = np.asarray(level_solve(linv, jnp.asarray(v), g_fallback))
    np.testing.assert_allclose(fast, slow, rtol=0, atol=1e-6)

    levels = dag_levels(np.asarray(NN))
    segs = level_segments(levels, n_sentinel=257)
    flat = np.concatenate([np.asarray(t).reshape(-1) for t in segs])
    real = flat[flat < 257]
    assert sorted(real.tolist()) == list(range(257))     # covers every site
    for t in segs:
        t = np.asarray(t)
        assert t.shape[1] in (128, 512)                  # class widths
        for row in t:                                    # one level per row
            sites = row[row < 257]
            assert len(set(levels[sites].tolist())) <= 1
    # walking rows across all tables visits levels in non-decreasing order
    row_levels = []
    for t in segs:
        for row in np.asarray(t):
            sites = row[row < 257]
            if len(sites):
                row_levels.append(int(levels[sites[0]]))
    assert row_levels == sorted(row_levels)
