#!/usr/bin/env python
"""Full-recipe unsupervised training of the np-nd-np flagship solver.

Reference recipe (config/Train/p-prodec2-gcnf-10-100-pytorch.yaml): Adam
lr 1e-4, weight decay 1e-10, clip 0.65, dropout 0.2, T=10 outer x 1 inner
BPTT, lambda=1, loss_sharpness kappa=5, exploration alpha=0.1, hidden 150 /
mem 100 / agg 100 / mem_agg 50 / classifier 50, streamed uniform random
k-SAT n in [4,100], alpha in [2,10], k in [2,10]. The reference's
train_batch_limit 4e6 at hidden 150 means ~2-3 instances per segment, so
small batches are faithful to the reference's effective batch size.

Runs for a wall-clock budget (TRAIN_WALL_S, default 4h) or TRAIN_STEPS,
whichever hits first; checkpoints best (by validation solved fraction) and
last every TRAIN_EVAL_EVERY steps into trained-models/np-nd-np-full/.

Final evaluation: the shared 4-SAT headline set (n=100, alpha=9) and a
sub-threshold 3-SAT set (n=100, alpha=3.5), each with and without WalkSAT.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/train_full.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.fg.loader import BatchLoader
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.train.loss import cnf_evaluate
from pdp_solver_tpu.utils.benchdata import make_ksat_set

CFG = dict(
    model_type="np-nd-np", model_name="np-nd-np-full",
    hidden_dim=150, mem_hidden_dim=100, agg_hidden_dim=100,
    mem_agg_hidden_dim=50, classifier_dim=50, prediction_dim=1,
    dropout=0.2, train_outer_recurrence_num=10,
    train_inner_recurrence_num=1, learning_rate=1e-4, weight_decay=1e-10,
    clip_norm=0.65, exploration=0.1, loss_sharpness=5, randomized=True,
    batch_size=8, train_batch_limit=4 * 10 ** 6,
    test_batch_limit=4 * 10 ** 7, test_recurrence_num=1000,
    local_search_iteration=0, epsilon=0.5, **{"lambda": 1.0})


_FWD_JIT = {}


def _forward_jit(solver, iters):
    """One jitted forward per (config, budget): a fresh jax.jit(lambda)
    per call would recompile the whole unrolled forward at every
    periodic eval."""
    key = (solver.cfg, iters)
    if key not in _FWD_JIT:
        _FWD_JIT[key] = jax.jit(
            lambda p, r, b, s: solver.forward(
                p, r, b, s, iters, is_training=False,
                check_termination=True))
    return _FWD_JIT[key]


def solved_fraction(trainer, batch, iters, ls_iters=0, seed=7, chunk=0):
    solver = trainer.solver
    if ls_iters:
        solver = type(solver)(dataclasses.replace(
            solver.cfg, local_search_iterations=ls_iters))
    rng = jax.random.PRNGKey(seed)
    r_s, r_f = jax.random.split(rng)
    state = solver.get_init_state(r_s, batch, randomized=True)
    (pred, _), _ = _forward_jit(solver, iters)(
        trainer.params, r_f, batch, state)
    solved, _ = cnf_evaluate(batch, pred)
    mask = np.asarray(batch.instance_mask)
    return float((np.asarray(solved) * mask).sum() / mask.sum())


def main():
    wall_budget = float(os.environ.get("TRAIN_WALL_S", 4 * 3600))
    max_steps = int(os.environ.get("TRAIN_STEPS", 100000))
    eval_every = int(os.environ.get("TRAIN_EVAL_EVERY", 200))
    outdir = os.environ.get(
        "TRAIN_OUT", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "..", "trained-models", "np-nd-np-full"))
    best_dir = os.path.join(outdir, "best")
    last_dir = os.path.join(outdir, "last")
    os.makedirs(best_dir, exist_ok=True)
    os.makedirs(last_dir, exist_ok=True)

    # validation: easy 3-SAT (sensitive early - the n=40 alpha=3.5 set reads
    # 0.000 for the first ~1k steps while the model is in fact improving;
    # probed step-900 numbers: easy 39% vs untrained 7.8%, hard 0% pure /
    # 75% with WalkSAT-100)
    val_gen = UniformCNFGenerator(6, 20, 3, 3, 2.0, 3.0, seed=123)
    val_batch = pack_instances([val_gen.generate() for _ in range(64)])

    # TRAIN_LR overrides the recipe's learning rate (e.g. a lower-lr
    # fine-tune from the best checkpoint after the constant-lr phase
    # plateaus; the reference recipe itself has no schedule)
    cfg = dict(CFG)
    if os.environ.get("TRAIN_LR"):
        cfg["learning_rate"] = float(os.environ["TRAIN_LR"])
    trainer = SatTrainer(cfg, seed=0)
    ts = trainer.init_train_state()
    start_step = 0
    resumed = False
    if (os.environ.get("TRAIN_RESUME", "1") != "0"
            and os.path.exists(os.path.join(
                last_dir, CFG["model_name"] + ".npz"))):
        ts = trainer._load_train_state(ts, last_dir)
        resumed = True
        start_step = int(os.environ.get("TRAIN_RESUME_STEP", "0"))
        print(f"resumed from {last_dir} (global_step "
              f"{float(ts.global_step):.0f}, counting from {start_step})",
              flush=True)
    step_fn = trainer._train_step_fn()
    gen = UniformCNFGenerator(4, 100, 2, 10, 2.0, 10.0, seed=start_step)
    loader = BatchLoader(generator=gen, epoch_size=10 ** 9,
                         batch_size=CFG["batch_size"],
                         limit=CFG["train_batch_limit"],
                         hidden_dim=CFG["hidden_dim"], fixed_shape=True)

    losses, evals = [], []
    # never clobber a better checkpoint from a previous (resumed) run: the
    # best-val watermark is persisted next to the best checkpoint
    best = -1.0
    best_meta = os.path.join(best_dir, "best_val.json")
    # keyed on the resume actually happening (not on TRAIN_RESUME_STEP
    # being set): a default resumed run must not reset the watermark and
    # let its first eval clobber a better best checkpoint
    if resumed and os.path.exists(best_meta):
        with open(best_meta) as f:
            best = float(json.load(f)["val_solved"])
        print(f"best-val watermark {best:.3f}", flush=True)
    t0 = time.time()
    done = start_step
    stop = False
    while not stop:
        for batch, _, macro_done in loader.iter_segments():
            ts, loss = step_fn(ts, trainer._next_rng(), batch)
            losses.append(float(loss))
            if macro_done:
                ts = ts._replace(global_step=ts.global_step + 1.0)
            done += 1
            if done % 25 == 0:
                print(f"step {done} ({time.time() - t0:.0f}s): "
                      f"loss {np.mean(losses[-25:]):.4f}", flush=True)
            if done % eval_every == 0:
                trainer.params = ts.params
                frac = solved_fraction(trainer, val_batch, iters=100)
                evals.append({"step": done, "val_solved": frac})
                print(f"eval step {done}: val solved {frac:.3f}", flush=True)
                trainer._save_train_state(ts, last_dir)
                if frac > best:
                    best = frac
                    trainer._save_train_state(ts, best_dir)
                    with open(best_meta, "w") as f:
                        json.dump({"val_solved": frac, "step": done}, f)
            if done >= max_steps or time.time() - t0 > wall_budget:
                stop = True
                break
    train_wall = time.time() - t0
    trainer._save_train_state(ts, last_dir)
    trainer.params = ts.params

    report = {
        "steps": done,
        "train_wall_s": round(train_wall, 1),
        "loss_first25": round(float(np.mean(losses[:25])), 4),
        "loss_last25": round(float(np.mean(losses[-25:])), 4),
        "param_count": int(trainer.solver.parameter_count(trainer.params)),
        "val_curve": evals,
        "recipe": "reference flagship (lr 1e-4, T=10, kappa=5, alpha=0.1, "
                  "hidden 150, uniform k-SAT n[4,100] a[2,10] k[2,10])",
    }
    with open(os.path.join(outdir, "train_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)

    # ---- final evaluation (written separately so a killed eval still
    # leaves the training report + checkpoints on disk) ----
    if os.environ.get("TRAIN_SKIP_EVAL"):
        return
    import pdp_solver_tpu.train.checkpoint as ckpt  # noqa
    trainer._load_params(best_dir)
    final = {}
    sets = {
        "3sat_n100_a3.5": pack_instances(make_ksat_set(
            seed=21, count=64, n=100, alpha=3.5, k=3)),
        "4sat_headline": pack_instances(make_ksat_set()),
    }
    for name, batch in sets.items():
        final[name] = {
            "no_ls": solved_fraction(trainer, batch, iters=300),
            "ls_300": solved_fraction(trainer, batch, iters=300,
                                      ls_iters=300),
        }
        print(name, final[name], flush=True)
    with open(os.path.join(outdir, "eval_report.json"), "w") as f:
        json.dump(final, f, indent=2)
    print(json.dumps(final), flush=True)


if __name__ == "__main__":
    main()
