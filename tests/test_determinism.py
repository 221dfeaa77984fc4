"""Determinism guards: same seeds -> same solutions, stable dataset."""

import jax
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from pdp_solver_tpu.utils.benchdata import make_ksat_set, dataset_fingerprint
from tests.helpers import cnf_instance, random_ksat


def test_bench_dataset_fingerprint_is_stable():
    insts = make_ksat_set(count=4)
    assert dataset_fingerprint(insts) == dataset_fingerprint(
        make_ksat_set(count=4))


def test_solver_is_deterministic(rng):
    insts = [cnf_instance(12, random_ksat(rng, 12, 30)) for _ in range(3)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02,
                                    t_max=10, local_search_iterations=30,
                                    epsilon=0.5))
    key = jax.random.PRNGKey(7)

    def run():
        state = solver.get_init_state(key, batch, randomized=True)
        (pred, _), _ = jax.jit(
            lambda r, b, s: solver.forward({}, r, b, s, 50,
                                           is_training=False,
                                           check_termination=True)
        )(key, batch, state)
        return np.asarray(pred)

    np.testing.assert_array_equal(run(), run())


def test_generator_reseed_reproduces(rng):
    from pdp_solver_tpu.fg.generators import UniformCNFGenerator
    g = UniformCNFGenerator(5, 10, 2, 3, 2.0, 3.0, seed=11)
    a = [g.generate() for _ in range(3)]
    g.reseed(11)
    b = [g.generate() for _ in range(3)]
    for (n1, m1, g1, s1, _), (n2, m2, g2, s2, _) in zip(a, b):
        assert n1 == n2 and m1 == m2
        np.testing.assert_array_equal(g1, g2)
        np.testing.assert_array_equal(s1, s2)
