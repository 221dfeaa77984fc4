#!/usr/bin/env python
"""Train the non-flagship learned solvers (p-nd-np, np-d-np) on the TPU.

Reference train configs:
  p-nd-np  config/Train/p-prodec2-nsp-cnf-3-10-pytorch.yaml  (SP propagator
           with learned adaptors + NeuralDecimator + NeuralPredictor)
  np-d-np  config/Train/p-prodec2-ndec-cnf-3-10-pytorch.yaml (neural
           message passer + SequentialDecimator(neural scorer) +
           IdentityPredictor)
Both: Adam lr 1e-4, wd 1e-10, clip 0.65, dropout 0.2, T=10x1 BPTT,
lambda=1, kappa=5, alpha=0.1, uniform k-SAT n[10,100] k[2,10] alpha[2,10].

Same TPU-loop discipline as tools/train_flagship.py (dense fixed-shape
packing, in-program PRNG, explicit device_put, BPTT remat, persistent
compilation cache, RSS guard with clean resume); run under
tools/train_supervisor.py for long budgets.

Usage: TRAIN_MODEL_TYPE=p-nd-np python tools/train_family.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from pdp_solver_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.fg.loader import BatchLoader
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.train.loss import cnf_evaluate
from pdp_solver_tpu.utils.benchdata import make_ksat_set

BASE = dict(
    prediction_dim=1, dropout=0.2, train_outer_recurrence_num=10,
    train_inner_recurrence_num=1, learning_rate=1e-4, weight_decay=1e-10,
    clip_norm=0.65, exploration=0.1, loss_sharpness=5, randomized=True,
    batch_size=512, train_batch_limit=4 * 10 ** 9, train_remat=True,
    test_batch_limit=4 * 10 ** 7, test_recurrence_num=1000,
    local_search_iteration=0, epsilon=0.5, **{"lambda": 1.0})

FAMILY = {
    # reference p-prodec2-nsp-cnf-3-10-pytorch.yaml
    "p-nd-np": dict(hidden_dim=150, mem_hidden_dim=50, agg_hidden_dim=50,
                    mem_agg_hidden_dim=50, classifier_dim=50,
                    has_meta_data=True),
    # reference p-prodec2-ndec-cnf-3-10-pytorch.yaml
    "np-d-np": dict(hidden_dim=150, mem_hidden_dim=100, agg_hidden_dim=100,
                    mem_agg_hidden_dim=50, classifier_dim=50,
                    tolerance=0.02, t_max=10),
}

FIXED_DIMS = tuple(int(x) for x in os.environ.get(
    "TRAIN_DIMS", "8192,32768,131072,128").split(","))

_FWD_JIT = {}


def _forward_jit(solver, iters):
    key = (solver.cfg, iters)
    if key not in _FWD_JIT:
        _FWD_JIT[key] = jax.jit(
            lambda p, r, b, s: solver.forward(
                p, r, b, s, iters, is_training=False,
                check_termination=True))
    return _FWD_JIT[key]


def solved_fraction(trainer, batch, iters, ls_iters=0, seed=7):
    solver = trainer.solver
    if ls_iters:
        solver = type(solver)(dataclasses.replace(
            solver.cfg, local_search_iterations=ls_iters))
    r_s, r_f = jax.random.split(jax.random.PRNGKey(seed))
    state = solver.get_init_state(r_s, batch, randomized=True)
    (pred, _), _ = _forward_jit(solver, iters)(
        trainer.params, r_f, batch, state)
    solved, _ = cnf_evaluate(batch, pred)
    mask = np.asarray(batch.instance_mask)
    return float((np.asarray(solved) * mask).sum() / mask.sum())


def main():
    model_type = os.environ.get("TRAIN_MODEL_TYPE", "p-nd-np")
    if model_type not in FAMILY:
        raise SystemExit(f"unknown TRAIN_MODEL_TYPE {model_type}; "
                         f"choose from {sorted(FAMILY)}")
    wall_budget = float(os.environ.get("TRAIN_WALL_S", 3600))
    max_steps = int(os.environ.get("TRAIN_STEPS", 10 ** 9))
    eval_every = int(os.environ.get("TRAIN_EVAL_EVERY", 500))
    log_every = int(os.environ.get("TRAIN_LOG_EVERY", 50))
    name = f"{model_type}-r4"
    outdir = os.environ.get(
        "TRAIN_OUT", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "..", "trained-models", name))
    best_dir = os.path.join(outdir, "best")
    last_dir = os.path.join(outdir, "last")
    os.makedirs(best_dir, exist_ok=True)
    os.makedirs(last_dir, exist_ok=True)

    cfg = dict(BASE, model_type=model_type, model_name=name,
               **FAMILY[model_type])
    if os.environ.get("TRAIN_LR"):
        cfg["learning_rate"] = float(os.environ["TRAIN_LR"])
    if os.environ.get("TRAIN_T"):
        # shorter outer unroll (reference T=10x1): np-d-np's unrolled
        # program exceeded the round-4 compile budget
        cfg["train_outer_recurrence_num"] = int(os.environ["TRAIN_T"])
    # scanned BPTT (train/trainer.py _loss_fn): the step body compiles
    # once instead of T times - the np-d-np compile unblock. Default ON
    # for np-d-np, off elsewhere (flagship keeps its committed programs).
    cfg["train_scan"] = os.environ.get(
        "TRAIN_SCAN", "1" if model_type == "np-d-np" else "0") == "1"
    trainer = SatTrainer(cfg, seed=0)
    trainer._make_optimizer()
    ts = trainer.init_train_state()
    start_step = 0
    resumed = False
    if (os.environ.get("TRAIN_RESUME", "1") != "0"
            and os.path.exists(os.path.join(last_dir, name + ".npz"))):
        ts = trainer._load_train_state(ts, last_dir)
        resumed = True
        meta_p = os.path.join(last_dir, "train_meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                start_step = int(json.load(f).get("step", 0))
        print(f"resumed from {last_dir} (step {start_step})", flush=True)
    step_fn = trainer._train_step_seeded_fn(base_seed=start_step & 0xFFFF)

    # training stream: the reference recipe (uniform n[10,100] k[2,10]
    # alpha[2,10]) with extra mass on the eval bands, as the flagship
    from pdp_solver_tpu.fg.generators import MixtureCNFGenerator
    gen = MixtureCNFGenerator(
        [UniformCNFGenerator(10, 100, 2, 10, 2.0, 10.0),
         UniformCNFGenerator(4, 100, 3, 3, 2.0, 4.2),
         UniformCNFGenerator(5, 100, 4, 4, 7.0, 9.9)],
        weights=[0.5, 0.25, 0.25], seed=start_step + 23)
    gen.reseed(start_step + 23)
    loader = BatchLoader(generator=gen, epoch_size=10 ** 9,
                         batch_size=cfg["batch_size"],
                         limit=cfg["train_batch_limit"],
                         hidden_dim=cfg["hidden_dim"], fixed_shape=True,
                         fixed_dims=FIXED_DIMS)

    easy_gen = UniformCNFGenerator(6, 20, 3, 3, 2.0, 3.0, seed=123)
    easy_val = jax.device_put(pack_instances(
        [easy_gen.generate() for _ in range(64)]))
    med_val = jax.device_put(pack_instances(make_ksat_set(
        seed=29, count=48, n=60, alpha=3.5, k=3)))

    losses, evals = [], []
    best = (-1.0, -1.0)
    best_meta = os.path.join(best_dir, "best_val.json")
    if resumed and os.path.exists(best_meta):
        with open(best_meta) as f:
            m = json.load(f)
        best = (float(m.get("med_solved", -1)),
                float(m.get("val_solved", -1)))

    def save_report(done, wall):
        report = {
            "model_type": model_type, "steps": done,
            "train_wall_s": round(wall, 1), "instances": total_inst,
            "loss_last25": (round(float(np.mean(losses[-25:])), 4)
                            if losses else None),
            "param_count": int(
                trainer.solver.parameter_count(trainer.params)),
            "val_curve": evals,
            "recipe": "reference %s recipe on TPU (lr %g, T=10, kappa=5, "
                      "alpha=0.1) over a 50/25/25 uniform/3SAT/4SAT "
                      "mixture, dense fixed-shape segments %s" % (
                          model_type, cfg["learning_rate"], FIXED_DIMS,),
        }
        with open(os.path.join(outdir, "train_report.json"), "w") as f:
            json.dump(report, f, indent=2)

    t0 = time.time()
    done = start_step
    total_inst = 0
    stop = False
    while not stop:
        for batch, _, macro_done in loader.iter_segments():
            nb = int(np.asarray(batch.instance_mask).sum())
            dev = jax.device_put(batch)
            ts, loss = step_fn(ts, np.int32(done & 0x7FFFFFFF), dev)
            total_inst += nb
            done += 1
            if macro_done:
                ts = ts._replace(global_step=ts.global_step + 1.0)
            if done % log_every == 0:
                losses.append(float(loss))   # sync point
                print(f"step {done} ({time.time() - t0:.0f}s, "
                      f"{total_inst} inst): loss {losses[-1]:.4f}",
                      flush=True)
            if done % eval_every == 0:
                with open("/proc/self/statm") as f:
                    rss_gb = (int(f.read().split()[1]) * os.sysconf(
                        "SC_PAGE_SIZE")) / (1 << 30)
                if rss_gb > float(os.environ.get("TRAIN_RSS_GB", "60")):
                    print(f"RSS {rss_gb:.1f} GB over budget: checkpoint "
                          "and exit for clean resume", flush=True)
                    stop = True
                trainer.params = ts.params
                trainer.global_step = ts.global_step
                easy = solved_fraction(trainer, easy_val, iters=100)
                med = solved_fraction(trainer, med_val, iters=300)
                evals.append({"step": done, "val_solved": easy,
                              "med_solved": med, "inst": total_inst,
                              "wall_s": round(time.time() - t0, 1)})
                print(f"eval step {done}: easy {easy:.3f} med {med:.3f}",
                      flush=True)
                trainer._save_train_state(ts, last_dir)
                with open(os.path.join(last_dir, "train_meta.json"),
                          "w") as f:
                    json.dump({"step": done}, f)
                if (med, easy) > best:
                    best = (med, easy)
                    trainer._save_train_state(ts, best_dir)
                    with open(best_meta, "w") as f:
                        json.dump({"val_solved": easy, "med_solved": med,
                                   "step": done}, f)
                save_report(done, time.time() - t0)
            if stop or done >= max_steps \
                    or time.time() - t0 > wall_budget \
                    or (done % 25 == 0 and os.path.exists(os.environ.get(
                        "TRAIN_STOP_FILE", "/tmp/pdp_train_stop"))):
                stop = True
                break

    trainer._save_train_state(ts, last_dir)
    with open(os.path.join(last_dir, "train_meta.json"), "w") as f:
        json.dump({"step": done}, f)
    trainer.params = ts.params
    save_report(done, time.time() - t0)
    print("training done:", done, "steps,", total_inst, "instances",
          flush=True)


if __name__ == "__main__":
    main()
