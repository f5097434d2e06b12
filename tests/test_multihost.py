"""Multi-host entry point: single-process degenerate-mode validation.

A real multi-host run needs multiple hosts; what CAN be validated here is
the entry point itself — process 0 starting the coordinator service,
joining the distributed runtime, building the global mesh, and running
the DP training path over it. Runs in a subprocess because
``jax.distributed.initialize`` must precede backend init.
"""

import os
import subprocess
import sys

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


def test_single_process_degenerate_mode():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(port=18476)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MULTIHOST_OK" in proc.stdout
