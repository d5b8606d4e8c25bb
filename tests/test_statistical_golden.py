"""Statistical golden tests (VERDICT r4 item 7): the reference's two
example-level acceptance experiments promoted into CI.

1. The interweaving negative control (Vignette.md:1148-1184): regressors
   passed as X_obs disable the interweaved centered beta redraw and the
   spatially coherent regressor's R-hat blows up relative to the X_locs
   fit at equal budget (the reference saw 61.6 vs ~1 after one cycle).
2. A Gelman-Rubin-Brooks trajectory sanity band on the vignette toy: the
   reference's protocol converges all univariate R-hats under 1.05 within
   its documented budget (Vignette.md:560-...); we assert a conservative
   band at a reduced budget.

Both are slow-marked (each runs thousands of toy Gibbs iterations on the
CPU backend).
"""

import numpy as np
import pytest

import nngp_tpu


def _simulate_vignette(rng, n_obs=900):
    """Vignette.rmd:24-49 scaled down: 1-D exponential GP (scale 10,
    range 5, noise 5) with duplicated sites, spatially coherent regressor
    (the coordinate) + white-noise regressor."""
    locs_1d = rng.uniform(0, 100, int(n_obs * 0.75))
    locs_1d = np.concatenate(
        [locs_1d, rng.choice(locs_1d, n_obs - len(locs_1d))]
    )
    u = np.unique(locs_1d)
    d = np.abs(u[:, None] - u[None, :])
    K = 10.0 * np.exp(-d / 5.0)
    w_u = np.linalg.cholesky(K + 1e-10 * np.eye(len(u))) @ rng.normal(
        size=len(u)
    )
    w = w_u[np.searchsorted(u, locs_1d)]
    X = np.stack([locs_1d, rng.normal(size=n_obs)], axis=1)
    y = 2.0 + w + X @ np.array([0.01, -1.6]) + rng.normal(size=n_obs) * np.sqrt(5.0)
    locs = np.stack([locs_1d, np.zeros(n_obs)], axis=1)
    return locs, y, X


@pytest.mark.slow
def test_interweaving_negative_control(rng):
    """X_obs (interweaving off) must leave the spatially coherent slope
    with a far worse R-hat than X_locs (interweaving on) at equal budget —
    the reference's deliberate failure demonstration
    (Vignette.md:1131-1184)."""
    locs, y, X = _simulate_vignette(rng)
    budget = dict(n_cycles=1, n_iterations_update=300, verbose=False,
                  Gelman_Rubin_Brooks_stop=(0.0, 0.0))

    mc_locs = nngp_tpu.initialize(
        locs, y, X_locs=X, m=5, n_chains=3,
        stationary_covfun="exponential_isotropic", seed=3,
    )
    mc_locs = nngp_tpu.run(mc_locs, **budget)
    grb_l = mc_locs.diagnostics["Gelman_Rubin_Brooks"][-1]
    rhat_locs = float(grb_l["R_hat"][grb_l["names"].index("V1")])

    mc_obs = nngp_tpu.initialize(
        locs, y, X_obs=X, m=5, n_chains=3,
        stationary_covfun="exponential_isotropic", seed=3,
    )
    mc_obs = nngp_tpu.run(mc_obs, **budget)
    grb_o = mc_obs.diagnostics["Gelman_Rubin_Brooks"][-1]
    rhat_obs = float(grb_o["R_hat"][grb_o["names"].index("V1")])

    # the white-noise regressor is fine either way (control of the control)
    rhat_obs_wn = float(grb_o["R_hat"][grb_o["names"].index("V2")])

    assert rhat_locs < 1.5, f"interweaved slope R-hat {rhat_locs}"
    assert rhat_obs > 3.0, (
        f"X_obs slope R-hat {rhat_obs} — negative control did not fail "
        "(interweaving may be silently active for X_obs columns)"
    )
    assert rhat_obs > 2 * rhat_locs
    assert rhat_obs_wn < 1.5, f"white-noise regressor R-hat {rhat_obs_wn}"


@pytest.mark.slow
def test_grb_trajectory_converges_within_band(rng):
    """GRB trajectory sanity band: on the vignette toy the reference's
    protocol reaches all univariate R-hat < 1.05 within 5x200 + 26x100
    iterations (Vignette.md:560-...); at a reduced 5x200 + 6x100 budget we
    assert the trajectory is (a) monotically improving cycle-over-cycle in
    the worst univariate (allowing small upticks) and (b) ends under 1.2
    with the multivariate under 2."""
    locs, y, X = _simulate_vignette(rng)
    mc = nngp_tpu.initialize(
        locs, y, X_locs=X, m=5, n_chains=3,
        stationary_covfun="exponential_isotropic", seed=4,
    )
    mc = nngp_tpu.run(mc, n_cycles=5, n_iterations_update=200,
                      Gelman_Rubin_Brooks_stop=(1.10, 1.05), verbose=False)
    mc = nngp_tpu.run(mc, n_cycles=6, n_iterations_update=100,
                      Gelman_Rubin_Brooks_stop=(1.05, 1.03), verbose=False)
    traj = [float(np.max(g["R_hat"][1:]))
            for g in mc.diagnostics["Gelman_Rubin_Brooks"]]
    final_uni = traj[-1]
    final_multi = float(mc.diagnostics["Gelman_Rubin_Brooks"][-1]["R_hat"][0])
    # band: worst univariate must at least halve its excess over 1 from
    # the first diagnostic cycle, and land under 1.2
    assert final_uni - 1 < 0.5 * (traj[0] - 1) + 1e-6, traj
    assert final_uni < 1.2, traj
    assert final_multi < 2.0, (final_multi, traj)
    # posterior sanity at this budget: noise variance CI should cover the
    # truth loosely (scale/range are weakly identified on a short run)
    est = nngp_tpu.estimate(mc)
    gp = est["covariance_params"]["GpGp_covparams"]
    noise_row = gp["table"][gp["names"].index("noise_variance")]
    assert noise_row[1] < 5.0 < noise_row[3] * 1.5, noise_row
