"""Diagnostics parity and determinism tests."""

import json
import os

import numpy as np
import pytest

import nngp_tpu
from nngp_tpu.diagnostics.ess import effective_size


def test_ess_iid_series(rng):
    """ESS of an iid series ~ its length."""
    x = rng.normal(size=4000)
    ess = effective_size(x)
    assert 0.7 * 4000 < ess < 1.3 * 4000


def test_ess_ar1_series(rng):
    """AR(1) with coefficient phi has ESS ~ n (1-phi)/(1+phi)."""
    n, phi = 20000, 0.8
    e = rng.normal(size=n)
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = phi * x[t - 1] + e[t]
    ess = effective_size(x)
    expected = n * (1 - phi) / (1 + phi)
    assert 0.6 * expected < ess < 1.6 * expected


def test_ess_constant_series():
    assert effective_size(np.ones(100)) == 0.0


def test_run_is_deterministic(rng):
    """Same seed => bit-identical records across independent runs
    (SURVEY.md §5 'determinism test per fixed key')."""
    locs = rng.uniform(size=(90, 2)) * 4
    y = rng.normal(size=90)

    def fit():
        mc = nngp_tpu.initialize(locs, y, m=4, n_chains=2, seed=11)
        return nngp_tpu.run(mc, n_cycles=1, n_iterations_update=20,
                            verbose=False, Gelman_Rubin_Brooks_stop=(0.0, 0.0))

    a, b = fit(), fit()
    for i in range(2):
        np.testing.assert_array_equal(
            a.records[i]["log_scale"], b.records[i]["log_scale"]
        )
        np.testing.assert_array_equal(a.records[i]["field"], b.records[i]["field"])


def test_jsonl_logging(rng, tmp_path):
    locs = rng.uniform(size=(80, 2)) * 4
    y = rng.normal(size=80)
    path = os.path.join(tmp_path, "log.jsonl")
    mc = nngp_tpu.initialize(locs, y, m=3, n_chains=2, seed=12)
    nngp_tpu.run(mc, n_cycles=2, n_iterations_update=10, verbose=False,
                 Gelman_Rubin_Brooks_stop=(0.0, 0.0), log_jsonl=path)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["iteration"] == 10 and lines[1]["iteration"] == 20
    assert "R_hat" in lines[0] and "Multivariate" in lines[0]["R_hat"]
    assert lines[1]["elapsed_s"] >= lines[0]["elapsed_s"]


def test_trace_plots(rng, tmp_path):
    locs = rng.uniform(size=(70, 2)) * 4
    y = rng.normal(size=70)
    X = rng.normal(size=(70, 2))
    mc = nngp_tpu.initialize(locs, y, X_locs=X, m=3, n_chains=2, seed=13)
    nngp_tpu.run(mc, n_cycles=1, n_iterations_update=12, verbose=False,
                 Gelman_Rubin_Brooks_stop=(0.0, 0.0), plot_trace=str(tmp_path),
                 plot_beta=True)
    assert os.path.exists(os.path.join(tmp_path, "trace_covparms.png"))
    assert os.path.exists(os.path.join(tmp_path, "trace_beta.png"))
