"""Name the eigen-direction behind the HM Multivariate-PSRF plateau
(VERDICT r3 item 3: MPSRF ~4.3 at cycle 20 while every univariate <= 1.03).

Loads a saved Heavy-metals fit, rebuilds W (mean within-chain covariance)
and B (between-chain covariance of means) exactly as the diagnostic does
(Scripts/mcmc_nngp_diagnose.R:13-16), and reports:

- MPSRF under our floored inverse vs the reference's plain-solve semantics
  (identical whenever cond(W) < 1e8 — experiments/grb_guard.py)
- the principal eigenvector of W^-1 B with per-parameter loadings scaled by
  within-chain sd (which parameter combination mixes slowly / disagrees
  across chains)
- the same after dropping the most-collinear parameter pairs, to separate
  "a real slow direction" from "near-null W amplification"

Run: PYTHONPATH= JAX_PLATFORMS=cpu python experiments/hm_mpsrf.py fit.pkl
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(path):
    import nngp_tpu
    from nngp_tpu.diagnostics.grb import (
        Gelman_Rubin_Brooks,
        _stack_nonfield_samples,
    )
    from experiments.grb_guard import mpsrf_reference, principal_direction

    mc = nngp_tpu.load(path)
    chains, names = _stack_nonfield_samples(mc.records, burn_in=0.5)
    ours = Gelman_Rubin_Brooks(mc.records, burn_in=0.5)
    ref, W, B = mpsrf_reference(chains)
    pdir = principal_direction(chains, names=names)

    # correlation structure of W: the most collinear parameter pairs are the
    # candidates for near-null directions that amplify the MPSRF
    sd = np.sqrt(np.diag(W))
    R = W / np.outer(sd, sd)
    iu = np.triu_indices_from(R, k=1)
    order = np.argsort(-np.abs(R[iu]))[:6]
    top_corr = [
        {"pair": [names[iu[0][k]], names[iu[1][k]]],
         "corr": round(float(R[iu][k]), 4)}
        for k in order
    ]

    out = {
        "fit": path,
        "iterations": int(mc.iterations),
        "mpsrf_ours": round(float(ours["R_hat"][0]), 3),
        "mpsrf_reference_semantics": round(float(ref), 3),
        "max_univariate": round(float(np.max(ours["R_hat"][1:])), 4),
        "cond_W": float(np.linalg.cond(W)),
        "principal_direction": pdir,
        "top_W_correlations": top_corr,
    }

    # MPSRF of the parameter subset without the top-loading parameter: if
    # dropping one parameter collapses the MPSRF toward 1, the plateau is a
    # (near-)pairwise direction, not a diffuse one
    lead = pdir["loadings"][0]["param"]
    keep = [j for j, nm in enumerate(names) if nm != lead]
    sub = [c[:, keep] for c in chains]
    ref_sub, _, _ = mpsrf_reference(sub)
    out["mpsrf_without_top_param"] = {"dropped": lead,
                                      "mpsrf": round(float(ref_sub), 3)}

    print(json.dumps(out, indent=1, default=float))
    with open("experiments/hm_mpsrf.json", "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("wrote experiments/hm_mpsrf.json")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "hm_fit.pkl")
