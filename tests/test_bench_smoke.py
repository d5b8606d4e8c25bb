"""Bench harness smoke test (VERDICT r3 weak #2): the driver's only perf
artifact is bench.py's single JSON line — a regression that crashes the
bench (round 3: ZeroDivisionError on empty lean records) must be caught by
the suite, pre-driver.  BENCH_SMOKE=1 runs every leg — including the
lean-record/deferred-pull path that broke — on a tiny CPU problem."""

import json
import os
import subprocess
import sys


def test_bench_smoke_emits_json():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        "BENCH_SMOKE": "1",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "",
        "BENCH_LEAN": "1",
    })
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in stdout: {r.stdout!r}"
    result = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in result
    # every leg must have completed (errors key absent) and produced a
    # non-degenerate measurement: ESS of a real timed window is > 0
    assert "errors" not in result["detail"], result["detail"].get("errors")
    assert result["value"] > 0.0
    assert result["vs_baseline"] > 0.0
    # the lean leg's timed window must have produced records (the round-3
    # defer_pull regression silently dropped them all); it is either the
    # headline or reported as best_chains_leg
    detail = result["detail"]
    legs = [detail["best_config"]] + [
        detail[k] for k in ("reference_protocol_3_chains", "best_chains_leg")
        if k in detail
    ]
    lean = [l for l in legs if l["lean_records"]]
    assert lean, f"no lean leg in {list(detail)}"
    assert lean[0]["ess_per_s"]["field_mean"] > 0.0
    assert lean[0]["rhat_timed_window"] is not None
    assert lean[0]["field_kept_samples"] > 0
