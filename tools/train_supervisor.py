#!/usr/bin/env python
"""Supervisor for long flagship training runs.

The tunnel client leaks ~8 MB of host RSS per dispatched step; the training
loop (tools/train_flagship.py) guards against the resulting OOM by
checkpointing and exiting cleanly once RSS crosses TRAIN_RSS_GB. Round 3's
run therefore *stopped* at the guard instead of surviving — a 20M-instance
recipe hits the guard dozens of times (VERDICT round 3, weak #7).

This wrapper owns the wall-clock budget and relaunches the trainer after
every clean exit; each relaunch resumes from `last` (TRAIN_RESUME=1 is the
trainer default) with a fresh process whose RSS starts from zero. The
persistent compilation cache makes relaunch warm-up cheap (~1 min vs the
15+ min cold ladder).

Exit conditions:
  * wall budget exhausted (SUP_WALL_S, default 4h)
  * the stop file exists (TRAIN_STOP_FILE, default /tmp/pdp_train_stop)
  * the trainer fails twice in a row within 120 s of launch (a real crash,
    not the RSS guard — the guard never trips that early)

Usage:
  SUP_WALL_S=14400 python tools/train_supervisor.py [-- extra env via env]
All TRAIN_* env knobs pass straight through to the trainer.
"""

import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
# SUP_TRAINER selects which trainer script to supervise (default: the
# flagship loop; tools/train_family.py runs long family budgets the same
# way). Relative names resolve inside tools/.
_trainer_name = os.environ.get("SUP_TRAINER", "train_flagship.py")
TRAINER = (_trainer_name if os.path.isabs(_trainer_name)
           else os.path.join(HERE, _trainer_name))


def main():
    wall_budget = float(os.environ.get("SUP_WALL_S", 4 * 3600))
    stop_file = os.environ.get("TRAIN_STOP_FILE", "/tmp/pdp_train_stop")
    t0 = time.time()
    fast_fails = 0
    launches = 0
    while True:
        remaining = wall_budget - (time.time() - t0)
        if remaining < 120:
            print(f"supervisor: wall budget exhausted after {launches} "
                  "launches", flush=True)
            break
        if os.path.exists(stop_file):
            print("supervisor: stop file present, exiting", flush=True)
            break
        env = dict(os.environ)
        # the child owns at most the remaining budget (it also checkpoints
        # and exits on its own RSS guard before that)
        env["TRAIN_WALL_S"] = str(int(remaining - 60))
        launches += 1
        print(f"supervisor: launch #{launches}, {remaining:.0f}s remaining",
              flush=True)
        t_launch = time.time()
        proc = subprocess.Popen([sys.executable, TRAINER], env=env,
                                start_new_session=True)
        try:
            rc = proc.wait()
        except KeyboardInterrupt:
            # forward a clean stop: create the stop file so the trainer
            # exits after the current step, then wait
            open(stop_file, "w").close()
            try:
                rc = proc.wait(timeout=600)
            except subprocess.TimeoutExpired:
                os.killpg(proc.pid, signal.SIGTERM)
                rc = proc.wait()
            break
        ran_s = time.time() - t_launch
        print(f"supervisor: trainer exited rc={rc} after {ran_s:.0f}s",
              flush=True)
        if rc != 0 and ran_s < 120:
            fast_fails += 1
            if fast_fails >= 2:
                print("supervisor: two consecutive fast failures — "
                      "aborting (real crash, not the RSS guard)", flush=True)
                sys.exit(1)
            time.sleep(30)
        else:
            fast_fails = 0


if __name__ == "__main__":
    main()
