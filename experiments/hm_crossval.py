"""Cross-validate the engine's Heavy-metals posterior against an
independent float64 fit (VERDICT r2 item 8; the reference's idiom is the
spNNGP cross-check, Results_analysis.R:7-9).

Independent oracle: a *collapsed* sampler in f64 NumPy on an HM subsample —
the latent field is integrated out analytically (y ~ N(X1 b, scale * C_v +
nv * I) with C_v the Vecchia-implied covariance from the SAME m=5 NNarray),
beta is integrated out of the theta MH ratio under its flat prior, and
theta = (log_scale, log_range, log_nv) moves by adaptive random-walk MH
with the engine's support constraints.  Same model, *different
augmentation, different precision, different code path* — agreement of the
posterior moments within joint MC error checks the whole engine.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python experiments/hm_crossval.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mcse(x):
    """Monte-Carlo SE via batch means."""
    x = np.asarray(x, dtype=np.float64)
    nb = max(len(x) // 20, 2)
    bm = np.array([b.mean() for b in np.array_split(x, 20)])
    return float(bm.std(ddof=1) / np.sqrt(len(bm)))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import nngp_tpu
    from nngp_tpu.utils.datasets import load_heavy_metals

    n_sub = int(os.environ.get("CROSSVAL_N", "700"))
    locs, y, X = load_heavy_metals()
    rng = np.random.default_rng(42)
    idx = rng.choice(len(y), size=n_sub, replace=False)
    locs_s, y_s = locs[idx], y[idx]
    X_s = {k: v[idx] for k, v in X.items()}
    var_y = float(np.var(y_s, ddof=1))

    # ---- engine fit (f32 JAX, field-augmented chromatic Gibbs) ----
    t0 = time.time()
    mc = nngp_tpu.initialize(
        locs_s, y_s, X_locs=X_s, m=5, stationary_covfun="exponential_sphere",
        n_chains=3, seed=7,
    )
    # run until every univariate R-hat <= 1.1 (the reference's own stop,
    # mcmc_nngp_run.R:2) so the engine side of the comparison is itself
    # converged (VERDICT r3 item 8: the r3 run compared at R-hat 1.315)
    n_cyc = int(os.environ.get("CROSSVAL_ENGINE_CYCLES", "40"))
    mc = nngp_tpu.run(mc, n_cycles=n_cyc, n_iterations_update=400,
                      field_thinning=0.1, verbose=False,
                      Gelman_Rubin_Brooks_stop=(0.0, 1.1))
    grb = mc.diagnostics["Gelman_Rubin_Brooks"][-1]
    print(f"engine: {mc.iterations} iters/chain in {time.time()-t0:.0f}s, "
          f"max univ R-hat "
          f"{float(np.max(grb['R_hat'][1:])):.3f}", flush=True)
    T = mc.iterations
    lo = T // 2
    eng = {}
    for k in ("log_scale", "log_noise_variance"):
        s = np.concatenate([rec[k][lo:] for rec in mc.records])
        per = [rec[k][lo:] for rec in mc.records]
        eng[k] = (float(s.mean()), float(np.mean([mcse(p) for p in per])
                                         / np.sqrt(len(per))), float(s.std()))
    s = np.concatenate([rec["shape"][lo:, 0] for rec in mc.records])
    per = [rec["shape"][lo:, 0] for rec in mc.records]
    eng["log_range"] = (float(s.mean()),
                        float(np.mean([mcse(p) for p in per])
                              / np.sqrt(len(per))), float(s.std()))
    b0 = np.concatenate([rec["beta_0"][lo:] for rec in mc.records])
    eng["beta_0"] = (float(b0.mean()),
                     float(np.mean([mcse(rec["beta_0"][lo:])
                                    for rec in mc.records]) / np.sqrt(3)),
                     float(b0.std()))

    # ---- oracle (same subsample, same NNarray graph for the Vecchia cov) --
    # the engine deduped/reordered; rebuild the oracle on the SAME unique
    # reordered locations and map y through locs_match ordering
    from nngp_tpu.preprocess.ordering import lonlat_to_xyz

    coords64 = lonlat_to_xyz(np.asarray(mc.locs, np.float64))
    lm = np.asarray(mc.graph.locs_match)
    # oracle observation vector in original obs order; covariance rows map
    # obs -> unique loc via locs_match: Sigma_obs = scale * Cv[lm][:, lm] + ...
    # To keep the oracle simple use the deduped sites directly when there
    # are no duplicates (subsample of 700 from 64k: duplicates possible);
    # handle via the lm mapping below.
    Xcols = np.stack([np.asarray(mc.data.X[:, j], np.float64)
                      for j in range(mc.data.X.shape[1])], axis=1)

    from nngp_tpu.ops.numpy_ref import np_vecchia_linv, np_sparse_L

    NN = np.asarray(mc.NNarray)
    n_iters = int(os.environ.get("CROSSVAL_ITERS", "2500"))

    def integrated_ll_factory():
        def integrated(theta):
            ls, lr, lnv = theta
            if np.exp(ls) >= var_y or np.exp(lnv) >= var_y:
                return -np.inf, None
            linv = np_vecchia_linv(coords64, NN, mc.graph.covfun,
                                   np.array([np.exp(lr)]))
            L = np_sparse_L(linv, NN).toarray()
            Cv = np.linalg.inv(L.T @ L)
            Sig = np.exp(ls) * Cv[lm][:, lm] + np.exp(lnv) * np.eye(len(lm))
            cf = np.linalg.cholesky(Sig)
            y64 = np.asarray(mc.observed_field, np.float64)
            X1 = np.concatenate([np.ones((len(lm), 1)), Xcols], axis=1)
            Si_y = np.linalg.solve(cf.T, np.linalg.solve(cf, y64))
            Si_X = np.linalg.solve(cf.T, np.linalg.solve(cf, X1))
            A = X1.T @ Si_X
            cA = np.linalg.cholesky(A)
            bhat = np.linalg.solve(cA.T, np.linalg.solve(cA, X1.T @ Si_y))
            quad = y64 @ Si_y - (X1.T @ Si_y) @ bhat
            ll = (-np.log(np.diag(cf)).sum() - np.log(np.diag(cA)).sum()
                  - 0.5 * quad)
            return ll, (bhat, cA)
        return integrated

    integrated = integrated_ll_factory()
    rng_o = np.random.default_rng(123)
    theta = np.array([np.log(0.5 * var_y), np.log(0.02),
                      np.log(0.4 * var_y)])
    ll, aux = integrated(theta)
    step = np.array([0.2, 0.2, 0.12])
    samples = {k: [] for k in ("log_scale", "log_range",
                               "log_noise_variance", "beta_0")}
    acc = 0
    t0 = time.time()
    for it in range(n_iters):
        prop = theta + step * rng_o.normal(size=3)
        llp, auxp = integrated(prop)
        if llp - ll > np.log(rng_o.uniform()):
            theta, ll, aux = prop, llp, auxp
            acc += 1
        if (it + 1) % 50 == 0 and it < n_iters // 3:
            rate = acc / 50.0
            acc = 0
            step *= 1.3 if rate > 0.3 else (0.75 if rate < 0.15 else 1.0)
        bhat, cA = aux
        beta = bhat + np.linalg.solve(cA.T, rng_o.normal(size=cA.shape[0]))
        samples["log_scale"].append(theta[0])
        samples["log_range"].append(theta[1])
        samples["log_noise_variance"].append(theta[2])
        samples["beta_0"].append(beta[0])
        if (it + 1) % 250 == 0:
            print(f"  oracle {it+1}/{n_iters} ({time.time()-t0:.0f}s) "
                  f"theta={theta.round(3)}", flush=True)

    lo_o = n_iters // 2
    report = {"n_sub": n_sub, "n_unique": int(mc.graph.n),
              "engine_iters": int(T), "oracle_iters": n_iters, "params": {}}
    ok_all = True
    for k in ("log_scale", "log_range", "log_noise_variance", "beta_0"):
        o = np.asarray(samples[k][lo_o:])
        om, ose, osd = float(o.mean()), mcse(o), float(o.std())
        em, ese, esd = eng[k]
        z = abs(em - om) / np.sqrt(ese ** 2 + ose ** 2 + 1e-12)
        ok = abs(em - om) < max(3 * np.sqrt(ese ** 2 + ose ** 2),
                                0.15 * max(esd, osd))
        ok_all &= ok
        report["params"][k] = {
            "engine_mean": round(em, 4), "engine_mcse": round(ese, 4),
            "engine_sd": round(esd, 4),
            "oracle_mean": round(om, 4), "oracle_mcse": round(ose, 4),
            "oracle_sd": round(osd, 4), "z": round(float(z), 2),
            "ok": bool(ok),
        }
        print(f"{k:20s} engine {em:+.4f}±{ese:.4f} (sd {esd:.3f})  "
              f"oracle {om:+.4f}±{ose:.4f} (sd {osd:.3f})  z={z:.2f} "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
    report["ok"] = bool(ok_all)
    with open("experiments/hm_crossval.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote experiments/hm_crossval.json; ok =", ok_all)


if __name__ == "__main__":
    main()
