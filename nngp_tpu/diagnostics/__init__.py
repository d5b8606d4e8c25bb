"""Convergence diagnostics: Gelman-Rubin-Brooks, effective sample size,
trace plots (reference: Scripts/mcmc_nngp_diagnose.R)."""

from nngp_tpu.diagnostics.grb import Gelman_Rubin_Brooks
from nngp_tpu.diagnostics.ess import ESS, effective_size

__all__ = ["Gelman_Rubin_Brooks", "ESS", "effective_size"]
