"""Real multi-process runtime: 2 processes x 4 CPU devices each through
`jax.distributed.initialize` (parallel/mesh.py distributed_initialize), with
a cross-process psum and a data-parallel solve on the global mesh.

The single-process suite only ever exercises an 8-device in-process mesh;
this spawns two actual processes so the coordinator/DCN code path runs.
"""

import os
import subprocess
import sys



_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
import numpy as np
import jax

from pdp_solver_tpu.parallel.mesh import distributed_initialize

distributed_initialize(
    coordinator_address="localhost:%s" % os.environ["COORD_PORT"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 4 local x 2 processes

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))

# cross-process psum over the global mesh
def f(x):
    return jax.lax.psum(x, "dp")

sharded = jax.jit(shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P()))
local = jnp.arange(4, dtype=jnp.float32) + 4.0 * jax.process_index()
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), np.asarray(local), (8,))
out = sharded(garr)
total = float(jax.device_get(out if not hasattr(out, "addressable_shards")
                             else out.addressable_shards[0].data)[0]) \
    if out.ndim else float(out)
# sum over 0..7 = 28 regardless of process
np.testing.assert_allclose(total, 28.0)

# a tiny data-parallel solve: every device solves its own packed shard and
# the solved fraction reduces across processes
from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.parallel.mesh import stack_batches, make_parallel_solve
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from tests.helpers import cnf_instance, random_ksat

rng = np.random.default_rng(0)  # same stream on both processes
batches = [pack_instances([cnf_instance(8, random_ksat(rng, 8, 12, k=2))],
                          pad_v=16, pad_f=16, pad_e=64, pad_b=2)
           for _ in range(8)]
solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02, t_max=5,
                                local_search_iterations=10, epsilon=0.5))
global_batch = jax.tree_util.tree_map(
    lambda *xs: jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")),
        np.stack([np.asarray(x) for x in xs])[
            4 * jax.process_index():4 * jax.process_index() + 4],
        (8,) + np.asarray(xs[0]).shape),
    *batches)
keys = jax.random.split(jax.random.PRNGKey(0), 8)
gkeys = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")),
    np.asarray(keys)[4 * jax.process_index():4 * jax.process_index() + 4],
    (8, 2))
states = [PDPSolver.get_init_state(solver, k, b, randomized=True)
          for k, b in zip(keys, batches)]
gstates = jax.tree_util.tree_map(
    lambda *xs: jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")),
        np.stack([np.asarray(x) for x in xs])[
            4 * jax.process_index():4 * jax.process_index() + 4],
        (8,) + np.asarray(xs[0]).shape),
    *states)

solve = make_parallel_solve(solver, 20, mesh=mesh)
preds, frac = solve({}, gkeys, global_batch, gstates)
frac = float(frac)
assert 0.0 <= frac <= 1.0
print("MULTIHOST_OK process=%d frac=%.3f" % (jax.process_index(), frac))
"""


def test_two_process_distributed_runtime(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = "56421"
    env_base = dict(os.environ)
    env_base.pop("PALLAS_AXON_POOL_IPS", None)
    env_base.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "REPO": repo,
        "COORD_PORT": port,
        "PYTHONPATH": repo,
    })
    procs = []
    for pid in range(2):
        env = dict(env_base, PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out
