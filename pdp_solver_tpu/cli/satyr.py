"""Inference CLI, argument-compatible with reference src/satyr.py.

Usage:
  python -m pdp_solver_tpu.cli.satyr MODEL_CONFIG TEST_PATH ITERS \
      [-b R] [-z BATCH] [-l LIMIT] [-w LS_ITERS] [-e EPS] [-v] [-c] [-d] \
      [-s SEED] [-o OUT.json]
"""

import argparse
import os
import sys
from datetime import datetime

from pdp_solver_tpu.cli import dimacs2json
from pdp_solver_tpu.utils.config import (
    load_yaml_config, merge_config, apply_classical_overrides, validate,
    make_logger)


def run(config, logger, output):
    # import here so JAX platform env decisions (e.g. -c) apply first
    from pdp_solver_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from pdp_solver_tpu.train.trainer import SatTrainer

    if config["verbose"]:
        logger.info("Building the computational graph...")
    predictor = SatTrainer(config, logger=logger,
                           seed=config["random_seed"])
    if config["verbose"]:
        logger.info("Starting the prediction phase...")

    if output == "":
        predictor.predict(config["test_path"], sys.stdout,
                          import_path=config.get("model_path"),
                          batch_replication=config["batch_replication"])
    else:
        with open(output, "w") as f:
            predictor.predict(config["test_path"], f,
                              import_path=config.get("model_path"),
                              batch_replication=config["batch_replication"])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("model_config")
    parser.add_argument("test_path")
    parser.add_argument("test_recurrence_num", type=int)
    parser.add_argument("-b", "--batch_replication", type=int, default=1)
    parser.add_argument("-z", "--batch_size", type=int, default=5000)
    parser.add_argument("-m", "--max_cache_size", type=int, default=100000)
    parser.add_argument("-l", "--test_batch_limit", type=int,
                        default=40000000)
    parser.add_argument("-w", "--local_search_iteration", type=int,
                        default=100)
    parser.add_argument("-e", "--epsilon", type=float, default=0.5)
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument("-c", "--cpu_mode", action="store_true")
    parser.add_argument("-d", "--dimacs", action="store_true")
    parser.add_argument("-s", "--random_seed", type=int,
                        default=int(datetime.now().microsecond))
    parser.add_argument("-o", "--output", default="")
    args = vars(parser.parse_args(argv))

    if args["cpu_mode"]:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    model_config = load_yaml_config(args["model_config"])
    logger = make_logger(model_config["model_name"])

    temp_file = None
    if args["dimacs"]:
        if args["verbose"]:
            logger.info("Converting DIMACS files into JSON...")
        if os.path.isfile(args["test_path"]):
            head, _ = os.path.split(args["test_path"])
            temp_file = os.path.join(head, "temp_problem_file.json")
            dimacs2json.convert_file_to(args["test_path"], temp_file, False)
        else:
            temp_file = os.path.join(args["test_path"],
                                     "temp_problem_file.json")
            dimacs2json.convert_directory(args["test_path"], temp_file, False)
        args["test_path"] = temp_file

    config = validate(apply_classical_overrides(
        merge_config(model_config, args)))

    run(config, logger, config["output"])

    if temp_file is not None:
        os.remove(temp_file)
    print("")


if __name__ == "__main__":
    main()
