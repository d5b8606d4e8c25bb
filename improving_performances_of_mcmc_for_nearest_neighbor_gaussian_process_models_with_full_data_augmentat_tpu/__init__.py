"""Alias package with the full project name.

The implementation lives in the short importable package ``nngp_tpu``;
this module re-exports everything and aliases the subpackages
(models/ops/parallel/utils/preprocess/diagnostics) so both import paths
work:

    import improving_performances_of_mcmc_for_nearest_neighbor_gaussian_process_models_with_full_data_augmentat_tpu as nngp
    from ..._tpu.models import gaussian
"""

import sys as _sys

import nngp_tpu as _impl
from nngp_tpu import *  # noqa: F401,F403
from nngp_tpu import __version__  # noqa: F401

_PREFIX = __name__
for _sub in (
    "api",
    "estimation",
    "prediction",
    "models",
    "models.gaussian",
    "ops",
    "ops.bessel",
    "ops.covariance",
    "ops.vecchia",
    "ops.trisolve",
    "ops.numpy_ref",
    "parallel",
    "parallel.chains",
    "parallel.collectives",
    "preprocess",
    "preprocess.ordering",
    "preprocess.neighbors",
    "preprocess.coloring",
    "preprocess.dedupe",
    "preprocess.design",
    "preprocess.graph",
    "diagnostics",
    "diagnostics.grb",
    "diagnostics.ess",
    "diagnostics.plots",
    "utils",
    "utils.rds",
    "utils.datasets",
    "utils.native",
):
    try:
        __import__(f"nngp_tpu.{_sub}")
        _sys.modules[f"{_PREFIX}.{_sub}"] = _sys.modules[f"nngp_tpu.{_sub}"]
    except ImportError:  # pragma: no cover
        pass

del _sys, _impl, _sub
