"""End-to-end coverage of all covariance families and reorderings through
the public API (registry parity: mcmc_nngp_initialize.R:62-69, :29-33)."""

import numpy as np
import pytest

import nngp_tpu


def _run_family(rng, covfun, locs, n_iters=25):
    y = rng.normal(size=len(locs)) + 0.5
    mc = nngp_tpu.initialize(
        locs, y, m=4, n_chains=2, stationary_covfun=covfun, seed=3
    )
    mc = nngp_tpu.run(mc, n_cycles=1, n_iterations_update=n_iters,
                      verbose=False, Gelman_Rubin_Brooks_stop=(0.0, 0.0))
    for rec in mc.records:
        assert np.isfinite(rec["log_scale"]).all()
        assert np.isfinite(rec["shape"]).all()
        assert np.isfinite(rec["field"]).all()
    return mc


@pytest.mark.parametrize(
    "covfun,n_shape",
    [
        ("exponential_isotropic", 1),
        ("matern_isotropic", 2),
        ("exponential_scaledim", 2),
        ("matern_scaledim", 3),
    ],
)
def test_families_2d(covfun, n_shape, rng):
    locs = rng.uniform(size=(120, 2)) * 5
    mc = _run_family(rng, covfun, locs)
    assert mc.records[0]["shape"].shape[1] == n_shape
    assert mc.space_time_model["covfun"]["shape_params"] == (
        nngp_tpu.api.shape_param_names(covfun, 2)
    )


@pytest.mark.parametrize(
    "covfun,n_shape",
    [
        ("exponential_sphere", 1),
        ("matern_sphere", 2),
    ],
)
def test_families_sphere(covfun, n_shape, rng):
    locs = np.stack([rng.uniform(-120, -60, 150), rng.uniform(25, 49, 150)], 1)
    mc = _run_family(rng, covfun, locs)
    assert mc.records[0]["shape"].shape[1] == n_shape
    # sphere graph embeds in R^3
    assert mc.graph.kernel_coords.shape[1] == 3


@pytest.mark.parametrize(
    "covfun,n_shape",
    [
        ("exponential_spacetime", 2),
        ("matern_spacetime", 3),
    ],
)
def test_families_spacetime(covfun, n_shape, rng):
    # 2 space dims + 1 time dim
    locs = np.concatenate(
        [rng.uniform(size=(130, 2)) * 5, rng.uniform(size=(130, 1)) * 10], 1
    )
    mc = _run_family(rng, covfun, locs)
    assert mc.records[0]["shape"].shape[1] == n_shape


@pytest.mark.parametrize(
    "reordering",
    ["maxmin", "random", ("coord", 1), ("dist_to_point", (0.0, 0.0)), "middleout"],
)
def test_reorderings_through_initialize(reordering, rng):
    locs = rng.uniform(size=(100, 2))
    y = rng.normal(size=100)
    mc = nngp_tpu.initialize(locs, y, m=3, n_chains=2, reordering=reordering,
                             seed=5)
    # the reordered unique locations are a permutation of the input
    got = set(map(tuple, np.round(mc.locs, 9)))
    want = set(map(tuple, np.round(locs, 9)))
    assert got == want
    # run the sampler for one representative reordering only (compiles are
    # the dominant test cost; the sampler math is ordering-agnostic)
    if reordering == "middleout":
        mc = nngp_tpu.run(mc, n_cycles=1, n_iterations_update=10, verbose=False,
                          Gelman_Rubin_Brooks_stop=(0.0, 0.0))
        assert np.isfinite(mc.records[0]["field"]).all()
    else:
        assert np.isfinite(np.asarray(mc.states.field)).all()


def test_matern_smoothness_recovery_smoke(rng):
    """Matérn end-to-end with the smoothness parameter actually sampled."""
    locs = rng.uniform(size=(250, 2)) * 6
    from scipy.spatial.distance import cdist
    import scipy.special

    d = cdist(locs, locs)
    nu = 0.8
    rho = 0.8
    with np.errstate(invalid="ignore"):
        K = (2 ** (1 - nu) / scipy.special.gamma(nu)
             * (d / rho) ** nu * scipy.special.kv(nu, d / rho))
    np.fill_diagonal(K, 1.0)
    K *= 3.0
    w = np.linalg.cholesky(K + 1e-8 * np.eye(250)) @ rng.normal(size=250)
    y = w + rng.normal(size=250) * 0.5
    mc = nngp_tpu.initialize(locs, y, m=6, n_chains=2,
                             stationary_covfun="matern_isotropic", seed=4)
    mc = nngp_tpu.run(mc, n_cycles=2, n_iterations_update=100, verbose=False,
                      Gelman_Rubin_Brooks_stop=(0.0, 0.0))
    est = nngp_tpu.estimate(mc)
    t = est["covariance_params"]["sampled_covparams"]
    tab = dict(zip(t["names"], t["table"]))
    # smoothness stays in the sampling support nu in (.5, 1) after transform
    s = tab["qlogis_smoothness"]
    nu_mean = 0.5 + 0.5 / (1 + np.exp(-s[0]))
    assert 0.5 < nu_mean < 1.0
    assert np.isfinite(t["table"]).all()
