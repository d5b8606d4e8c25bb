"""Prediction tests: conditional-simulation math vs the dense GP oracle,
plus API-level contracts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nngp_tpu
from nngp_tpu.ops.covariance import correlation_fn
from nngp_tpu.ops.trisolve import level_solve
from nngp_tpu.ops.vecchia import linv_mult, vecchia_linv
from nngp_tpu.prediction import _joint_graph


class _FakeMC:
    pass


def test_conditional_simulation_matches_dense_gp(rng):
    """With m = n_joint - 1 the Vecchia conditional simulation is the exact
    GP conditional: check mean and covariance of w_pred | w_obs."""
    n, n_pred = 25, 8
    locs = rng.uniform(size=(n, 2)) * 4
    pred_locs = rng.uniform(size=(n_pred, 2)) * 4
    mc = _FakeMC()
    mc.locs = locs
    mc.space_time_model = {
        "covfun": {"stationary_covfun": "exponential_isotropic",
                   "shape_params": ["log_range"]}
    }

    class G:  # minimal graph stand-in for n
        pass

    g = _joint_graph(mc, pred_locs, m=n + n_pred - 1)
    log_range = np.log(0.9)
    log_scale = np.log(2.5)
    beta_0 = 0.6
    sd = np.exp(0.5 * log_scale)
    w_obs = rng.normal(size=n).astype(np.float32) + beta_0

    linv_j = vecchia_linv(g, jnp.exp(jnp.asarray([log_range], jnp.float32)))
    w_ext = jnp.concatenate(
        [jnp.asarray((w_obs - beta_0) / sd, jnp.float32), jnp.zeros(n_pred)]
    )
    v = linv_mult(linv_j, w_ext, g)[:n]

    draws = np.zeros((4000, n_pred))
    key = jax.random.key(0)

    @jax.jit
    def draw(z):
        rhs = jnp.concatenate([v, z])
        return sd * level_solve(linv_j, rhs, g)[n:]

    for t in range(draws.shape[0]):
        z = jax.random.normal(jax.random.fold_in(key, t), (n_pred,))
        draws[t] = np.asarray(draw(z))

    # dense oracle
    corr = correlation_fn("exponential_isotropic")
    joint = np.concatenate([locs, pred_locs], 0).astype(np.float32)
    K = np.asarray(corr(jnp.asarray(joint)[None], jnp.asarray([0.9], jnp.float32))[0],
                   dtype=np.float64) * np.exp(log_scale)
    Koo, Kpo, Kpp = K[:n, :n], K[n:, :n], K[n:, n:]
    mean_ref = Kpo @ np.linalg.solve(Koo, (w_obs - beta_0).astype(np.float64))
    cov_ref = Kpp - Kpo @ np.linalg.solve(Koo, Kpo.T)
    sd_ref = np.sqrt(np.diag(cov_ref))
    assert np.abs(draws.mean(0) - mean_ref).max() < 6 * sd_ref.max() / np.sqrt(4000) + 5e-3
    assert np.abs(draws.std(0) / sd_ref - 1).max() < 0.1


def _small_fit(rng, n=150, n_chains=2, iters=40):
    locs = rng.uniform(size=(n, 2)) * 5
    y = rng.normal(size=n) + 1.0
    mc = nngp_tpu.initialize(locs, y, m=4, n_chains=n_chains, seed=4)
    return nngp_tpu.run(mc, n_cycles=1, n_iterations_update=iters, verbose=False,
                        field_thinning=0.5, Gelman_Rubin_Brooks_stop=(0.0, 0.0))


def test_predict_field_api(rng):
    mc = _small_fit(rng)
    pred_locs = rng.uniform(size=(30, 2)) * 5
    out = nngp_tpu.predict_field(mc, pred_locs, burn_in=0.5, m=6)
    assert len(out["predicted_field_samples"]) == 2
    for s in out["predicted_field_samples"]:
        assert s.shape[1] == 30
        assert np.isfinite(s).all()
    assert out["predicted_field_summary"]["table"].shape == (30, 5)
    # prediction at (nearly) observed locations should track the field values
    out2 = nngp_tpu.predict_field(mc, mc.locs[:10] + 1e-6, burn_in=0.5, m=6)
    est = nngp_tpu.estimate(mc, burn_in=0.5)
    fld_mean = est["field"]["table"][:10, 0]
    pred_mean = out2["predicted_field_summary"]["table"][:, 0]
    assert np.abs(pred_mean - fld_mean).max() < 0.5


def test_predict_fixed_effects_api(rng):
    n = 120
    locs = rng.uniform(size=(n, 2)) * 5
    X = rng.normal(size=(n, 2))
    y = 1.0 + X @ np.array([0.5, -0.5]) + rng.normal(size=n)
    mc = nngp_tpu.initialize(locs, y, X_locs=X, m=4, n_chains=2, seed=9)
    mc = nngp_tpu.run(mc, n_cycles=1, n_iterations_update=30, verbose=False,
                      Gelman_Rubin_Brooks_stop=(0.0, 0.0))
    Xp = rng.normal(size=(12, 2))
    out = nngp_tpu.predict_fixed_effects(mc, Xp, add_intercept=True)
    assert out["predicted_fixed_effects_summary"]["table"].shape == (12, 5)
    # manual check on one sample
    rec = mc.records[0]
    stored = rec["saved_field"]
    stored = stored[stored > 0.5 * stored.max()]
    b0 = rec["beta_0"][stored - 1][:, None] - rec["beta"][stored - 1] @ mc.design.X_mean[:, None]
    manual = np.concatenate([b0, rec["beta"][stored - 1]], 1) @ np.concatenate(
        [np.ones((12, 1)), Xp], 1).T
    assert np.allclose(out["predicted_fixed_effects_samples"][0], manual)
    # unknown covariate name errors cleanly
    with pytest.raises(ValueError):
        nngp_tpu.predict_fixed_effects(mc, {"nonexistent": np.ones(3)})
