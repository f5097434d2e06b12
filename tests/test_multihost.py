"""Multi-host entry point validation.

Two tiers, both in subprocesses because ``jax.distributed.initialize``
must precede backend init:

- degenerate single-process mode: process 0 starting the coordinator
  service, joining the runtime, building the global mesh, running DP
  training over it;
- a REAL 2-process run (the closest thing to multi-host testable on one
  machine): two OS processes, each owning 4 virtual CPU devices, join a
  localhost coordinator into one 8-device global mesh; each process
  feeds only its local half of the batch
  (``jax.make_array_from_process_local_data``) and runs
  ``dp_train_dict`` over the global mesh — the psum'd aggregate
  statistics cross the process boundary through the distributed
  runtime's collectives. The replicated result must be identical on
  both processes AND equal to the single-process 8-virtual-device run of
  the same training (same global mesh shape -> same per-device RNG
  streams) to reduction-order tolerance — the cross-process all-reduce
  (Gloo) may sum shards in a different order than the in-process one, so
  agreement is to ~1 ULP (measured max |diff| 1.1e-16 in f64), asserted
  at 1e-13.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
from onmf_ontf_ndl_tpu.parallel import multihost

multihost.initialize(coordinator_address="localhost:{port}",
                     num_processes=1, process_id=0)
assert multihost.is_initialized()
multihost.initialize()   # idempotent second call is a no-op
assert multihost.process_count() == 1
assert multihost.process_index() == 0
assert multihost.local_device_count() == 8

mesh = multihost.global_mesh()
assert mesh.shape == {{"dp": 8}}, mesh.shape
mesh2 = multihost.global_mesh({{"dp": 4, "tp": 2}})
assert mesh2.shape == {{"dp": 4, "tp": 2}}

# the DP layer runs unchanged over the global mesh
from onmf_ontf_ndl_tpu.models.state import init_state
from onmf_ontf_ndl_tpu.parallel.dp import dp_train_dict
X = jax.random.uniform(jax.random.key(1), (12, 64))
st = init_state(jax.random.key(0), 12, 4)
st = dp_train_dict(mesh, st, X, iterations=3, batch_size_per_device=4)
assert float(st.t) == 3.0
multihost.shutdown()
print("MULTIHOST_OK")
"""


def _subprocess_env(device_count: int) -> dict:
    import re

    env = dict(os.environ)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={device_count}"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_single_process_degenerate_mode():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(port=18476)],
        env=_subprocess_env(8), cwd=REPO, capture_output=True, text=True,
        timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MULTIHOST_OK" in proc.stdout


WORKER = """
import sys

rank = int(sys.argv[1])
port, outdir = sys.argv[2], sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from onmf_ontf_ndl_tpu.parallel import multihost

multihost.initialize(coordinator_address="localhost:" + port,
                     num_processes=2, process_id=rank)
assert multihost.process_count() == 2, multihost.process_count()
assert multihost.process_index() == rank
assert multihost.local_device_count() == 4
assert len(jax.devices()) == 8          # the GLOBAL device set

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from onmf_ontf_ndl_tpu.models.state import init_state
from onmf_ontf_ndl_tpu.parallel.dp import dp_train_dict

mesh = multihost.global_mesh()
assert mesh.shape == {"dp": 8}, mesh.shape

d, r, n = 12, 4, 64
X_full = np.random.default_rng(42).random((d, n))
half = n // 2
X_local = X_full[:, rank * half:(rank + 1) * half]
X_global = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(None, "dp")), X_local)

st = init_state(jax.random.key(0), d, r, dtype=jnp.float64)
st2 = dp_train_dict(mesh, st, X_global, iterations=3,
                    batch_size_per_device=4)
assert float(st2.t) == 3.0
np.save(outdir + "/W_" + str(rank) + ".npy",
        np.asarray(st2.W.addressable_shards[0].data))
np.save(outdir + "/A_" + str(rank) + ".npy",
        np.asarray(st2.A.addressable_shards[0].data))
multihost.shutdown()
print("RANK" + str(rank) + "_OK", flush=True)
"""


def test_two_process_dp_train_matches_single_process(tmp_path):
    """SURVEY §5 distributed backend: true multi-process jax.distributed
    run, cross-process psum, result equal to the single-process run."""
    env = _subprocess_env(4)
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER)
    procs = [subprocess.Popen(
        [sys.executable, script, str(rank), "18761", str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for rank in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (out, errtxt)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank}: {errtxt[-2000:]}"
        assert f"RANK{rank}_OK" in out

    # both processes hold the same replicated result
    W0 = np.load(tmp_path / "W_0.npy")
    W1 = np.load(tmp_path / "W_1.npy")
    np.testing.assert_array_equal(W0, W1)
    A0 = np.load(tmp_path / "A_0.npy")
    np.testing.assert_array_equal(A0, np.load(tmp_path / "A_1.npy"))
    assert np.isfinite(W0).all() and np.abs(A0).sum() > 0

    # ... and it equals the single-process 8-virtual-device run of the
    # same training (same global mesh shape -> same RNG streams)
    import jax
    import jax.numpy as jnp
    from onmf_ontf_ndl_tpu.models.state import init_state
    from onmf_ontf_ndl_tpu.parallel.dp import dp_train_dict
    from onmf_ontf_ndl_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        return  # comparison needs the conftest's 8 virtual devices
    mesh = make_mesh({"dp": 8})
    X_full = np.random.default_rng(42).random((12, 64))
    st = init_state(jax.random.key(0), 12, 4, dtype=jnp.float64)
    st_single = dp_train_dict(mesh, st, jnp.asarray(X_full), iterations=3,
                              batch_size_per_device=4)
    np.testing.assert_allclose(W0, np.asarray(st_single.W),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(A0, np.asarray(st_single.A),
                               rtol=0, atol=1e-13)
