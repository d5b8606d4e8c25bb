"""Response-model samplers.

One module per response model, mirroring the reference's per-response-model
update files (the reference ships Gaussian only —
Scripts/mcmc_nngp_update_Gaussian.R; dispatch at mcmc_nngp_run.R:12).
"""

from nngp_tpu.models.gaussian import (
    ChainState,
    ModelData,
    UpdateConfig,
    make_cycle_fn,
    run_cycle,
)

RESPONSE_MODELS = ("Gaussian",)

__all__ = [
    "ChainState",
    "ModelData",
    "UpdateConfig",
    "make_cycle_fn",
    "run_cycle",
    "RESPONSE_MODELS",
]
