"""Two-process jax.distributed harness (CPU/gloo) for the multi-host path.

Simulates 2 hosts x 2 devices: both processes join a coordinator via
``initialize_distributed``, build the identical toy problem, run one
shard_map'd cycle over the *global* 4-device chains mesh, and check

- each process' addressable chain shard bit-matches the unsharded vmap run
  of the same keys (chain parallelism is value-preserving, like the
  reference's fork join — mcmc_nngp_update_Gaussian.R:25);
- the collective Gelman-Rubin reduction (psum/pmean over DCN in prod,
  gloo here) agrees across processes.

This is the standard JAX multi-process CPU harness (SURVEY.md §4).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
sys.path.insert(0, sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import numpy as np
from nngp_tpu.parallel.distributed import (
    initialize_distributed, global_chains_mesh, local_chain_slice,
)

ok = initialize_distributed(f"localhost:{port}", 2, pid)
assert ok, "distributed runtime failed to start"
assert jax.process_count() == 2
assert jax.device_count() == 4, jax.devices()
assert len(jax.local_devices()) == 2

import nngp_tpu
from nngp_tpu.models.gaussian import UpdateConfig, make_cycle_fn
from nngp_tpu.parallel.chains import make_sharded_cycle_fn, shard_states
from nngp_tpu.parallel.collectives import make_collective_grb_fn

rng = np.random.default_rng(0)
n = 80
locs = rng.uniform(size=(n, 2)) * 6
y = np.sin(locs[:, 0]) + rng.normal(size=n) * 0.4
mc = nngp_tpu.initialize(locs, y, m=4, n_chains=4, seed=3,
                         stationary_covfun="exponential_isotropic")
cfg = UpdateConfig(n_iterations=8, shape_names=("log_range",), locs_cols=())

import jax.numpy as jnp
base = jax.random.key(mc.seed)
ck = jax.random.fold_in(base, 0)
keys = jax.vmap(lambda i: jax.random.fold_in(ck, i))(jnp.arange(4))

from jax._src import distributed as _dist
def barrier(name):
    # keep the two processes in step so the lazily-created gloo context's
    # 30 s rendezvous window is never exceeded by compile-time skew
    _dist.global_state.client.wait_at_barrier(name, timeout_in_ms=300_000)

mesh = global_chains_mesh()
graph_d, data_d = jax.device_put((mc.graph, mc.data))
sharded_fn = make_sharded_cycle_fn(graph_d, data_d, cfg, mesh)
states = shard_states(mc.states, mesh)
states2, recs = sharded_fn(states, keys, jnp.asarray(0, jnp.int32))
jax.block_until_ready(states2.field)

# collective GRB over the global chains axis (records stay device-local)
samples = jnp.stack(
    [recs["log_scale"], recs["log_noise_variance"]], axis=-1
)
barrier("pre_grb")
grb = make_collective_grb_fn(mesh, 4)(samples)
grb = np.asarray(grb)

# unsharded reference on this process' first local device
plain_fn = make_cycle_fn(graph_d, data_d, cfg)
ref_states, ref_recs = plain_fn(
    jax.device_put(jax.tree.map(np.asarray, mc.states)), keys,
    jnp.asarray(0, jnp.int32),
)

lo, hi = local_chain_slice(4, mesh)
def local_np(leaf):
    shards = sorted(leaf.addressable_shards, key=lambda s: s.index[0].start)
    return np.concatenate([np.asarray(s.data) for s in shards])
mine = local_np(states2.field)
ref = np.asarray(ref_states.field)[lo:hi]
assert mine.shape == ref.shape
np.testing.assert_allclose(mine, ref, rtol=2e-5, atol=2e-5)
with open(out, "w") as f:
    json.dump({"pid": pid, "grb": grb.tolist(), "lo": lo, "hi": hi}, f)
"""


@pytest.mark.slow
def test_two_process_cpu(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = 23987
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONUNBUFFERED": "1",
    }
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py), str(pid), str(port),
                 str(out), REPO],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            log, _ = p.communicate()
        logs.append(log)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]
    r0 = json.loads(outs[0].read_text())
    r1 = json.loads(outs[1].read_text())
    assert (r0["lo"], r0["hi"]) == (0, 2)
    assert (r1["lo"], r1["hi"]) == (2, 4)
    # the collective reduction must agree bit-for-bit across processes
    np.testing.assert_allclose(r0["grb"], r1["grb"], rtol=1e-6)
    assert np.all(np.isfinite(r0["grb"]))
