"""Quick 96-chain TPU probe: did the r3 divergence fixes (range support cap,
solve-form interweaved beta, kernel-unit sphere inits, saturation-safe
exp_acc) cure the NaN / R-hat blow-up seen in bench_r3_run{1,2}.log?

Runs the bench warmup loop only (700 iters, R-hat printed every 100) plus a
minimal timed window, then prints one JSON line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    eng = bench.measure_engine(
        n_chains=int(os.environ.get("PROBE_CHAINS", "96")),
        schedule="pallas",
        warmup_iters=100,
        warmup_max_iters=int(os.environ.get("PROBE_WARMUP", "700")),
        n_timed_iters=100,
        n_iterations_update=100,
        field_thinning=0.05,
        max_device_iters=100,
    )
    out = {
        "rhat_warmup_end": eng["rhat_warmup_end"],
        "rhat_timed_window": eng["rhat_timed_window"],
        "it_per_s": round(eng["it_per_s"], 3),
        "warmup_iters": eng["warmup_iters"],
        "backend": eng["backend"],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
