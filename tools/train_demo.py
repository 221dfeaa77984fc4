#!/usr/bin/env python
"""End-to-end training demonstration: np-nd-np learns to solve easy 3-SAT.

Trains the fully-neural solver with the unsupervised energy loss on streamed
uniform random 3-SAT and reports the solved fraction (WITHOUT WalkSAT
post-processing, so the number reflects the learned model alone) before and
after training. Writes the trained checkpoint + a JSON report.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python tools/train_demo.py [steps] [outdir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.fg.loader import BatchLoader
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.train.loss import cnf_evaluate
from pdp_solver_tpu.train import checkpoint as ckpt


CFG = dict(
    model_type="np-nd-np", model_name="demo-np-nd-np", hidden_dim=32,
    mem_hidden_dim=32, agg_hidden_dim=32, mem_agg_hidden_dim=16,
    classifier_dim=16, prediction_dim=1, dropout=0.1,
    train_outer_recurrence_num=6, train_inner_recurrence_num=1,
    learning_rate=3e-4, weight_decay=1e-10, clip_norm=0.65,
    exploration=0.1, loss_sharpness=5, randomized=True,
    batch_size=32, train_batch_limit=10 ** 7, test_batch_limit=10 ** 7,
    test_recurrence_num=30, local_search_iteration=0, epsilon=0.5,
    **{"lambda": 1.0})


def solved_fraction(trainer, batch, iters=30, seed=7):
    rng = jax.random.PRNGKey(seed)
    r_s, r_f = jax.random.split(rng)
    state = trainer.solver.get_init_state(r_s, batch, randomized=True)
    (pred, _), _ = jax.jit(
        lambda p, r, b, s: trainer.solver.forward(
            p, r, b, s, iters, is_training=False, check_termination=True)
    )(trainer.params, r_f, batch, state)
    solved, _ = cnf_evaluate(batch, pred)
    mask = np.asarray(batch.instance_mask)
    return float((np.asarray(solved) * mask).sum() / mask.sum())


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pdp_train_demo"
    os.makedirs(outdir, exist_ok=True)

    # evaluation set: fixed easy 3-SAT (most instances satisfiable)
    eval_gen = UniformCNFGenerator(6, 20, 3, 3, 2.0, 3.0, seed=123)
    eval_batch = pack_instances([eval_gen.generate() for _ in range(64)])

    trainer = SatTrainer(CFG, seed=0)
    before = solved_fraction(trainer, eval_batch)

    ts = trainer.init_train_state()
    step_fn = trainer._train_step_fn()
    gen = UniformCNFGenerator(6, 20, 3, 3, 2.0, 3.0, seed=0)
    loader = BatchLoader(generator=gen, epoch_size=CFG["batch_size"],
                         batch_size=CFG["batch_size"], limit=10 ** 7,
                         hidden_dim=CFG["hidden_dim"], fixed_shape=True)

    losses = []
    t0 = time.time()
    done = 0
    while done < steps:
        for batch, _ in loader:
            ts, loss = step_fn(ts, trainer._next_rng(), batch)
            losses.append(float(loss))
            ts = ts._replace(global_step=ts.global_step + 1.0)
            done += 1
            if done >= steps:
                break
            if done % 25 == 0:
                print(f"step {done}: loss {np.mean(losses[-25:]):.4f}",
                      flush=True)
    train_wall = time.time() - t0

    trainer.params = ts.params
    after = solved_fraction(trainer, eval_batch)
    trainer._save_train_state(ts, outdir)

    report = {
        "steps": steps,
        "train_wall_s": round(train_wall, 1),
        "loss_first25": round(float(np.mean(losses[:25])), 4),
        "loss_last25": round(float(np.mean(losses[-25:])), 4),
        "solved_fraction_untrained": before,
        "solved_fraction_trained": after,
        "eval": "64 uniform 3-SAT, n in [6,20], alpha in [2,3], "
                "30 iterations, no WalkSAT",
    }
    with open(os.path.join(outdir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
