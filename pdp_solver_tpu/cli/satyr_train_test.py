"""Train/test CLI, argument-compatible with reference src/satyr-train-test.py.

Usage:
  python -m pdp_solver_tpu.cli.satyr_train_test CONFIG.yaml \
      [-t] [-l best|last] [-c] [-r] [-g] [-b R]
"""

import argparse
import csv
import os

from pdp_solver_tpu.utils.config import (
    load_yaml_config, validate, make_logger)


def write_to_csv(result_list, file_path):
    with open(file_path, mode="w", newline="") as f:
        writer = csv.writer(f, delimiter=",", quotechar='"',
                            quoting=csv.QUOTE_MINIMAL)
        for row in result_list:
            writer.writerow([row[0], row[1][1, 0]])


def write_to_csv_time(result_list, file_path):
    with open(file_path, mode="w", newline="") as f:
        writer = csv.writer(f, delimiter=",", quotechar='"',
                            quoting=csv.QUOTE_MINIMAL)
        for row in result_list:
            writer.writerow([row[0], row[2]])


def run(random_seed, config_file, is_training, load_model, cpu, reset_step,
        use_generator, batch_replication):
    if cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from pdp_solver_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from pdp_solver_tpu.fg.generators import make_generator
    from pdp_solver_tpu.train.trainer import SatTrainer

    config = validate(load_yaml_config(config_file))
    logger = make_logger(config["model_name"] + " (" + config["version"] + ")")

    for key in ("train_path", "validation_path"):
        if not isinstance(config[key], list):
            config[key] = [
                os.path.join(config[key], f) for f in os.listdir(config[key])
                if os.path.isfile(os.path.join(config[key], f))
                and f.endswith(".json")]

    best_path = os.path.join(os.path.relpath(config["model_path"]),
                             config["model_name"], config["version"], "best")
    last_path = os.path.join(os.path.relpath(config["model_path"]),
                             config["model_name"], config["version"], "last")
    os.makedirs(best_path, exist_ok=True)
    os.makedirs(last_path, exist_ok=True)

    trainer = SatTrainer(config, logger=logger, seed=random_seed)

    if is_training:
        if config["verbose"]:
            logger.info("Starting the training phase...")
        generator = make_generator(config, seed=random_seed) \
            if use_generator else None
        trainer.train(
            train_files=config["train_path"],
            validation_files=config["validation_path"],
            last_export_path=last_path, best_export_path=best_path,
            metric_index=config["metric_index"], load_model=load_model,
            reset_step=reset_step, generator=generator,
            train_epoch_size=config["train_epoch_size"])

    if config["verbose"]:
        logger.info("Starting the test phase...")

    for test_files in config["test_path"]:
        if load_model == "last":
            import_path = last_path
        elif load_model == "best":
            import_path = best_path
        else:
            # reference tests the final in-memory (last-epoch) model when no
            # -l flag is given (satyr-train-test.py:112-117)
            import_path = None

        result = trainer.test(test_files, import_path=import_path,
                              batch_replication=batch_replication)
        if config["verbose"]:
            for row in result:
                print("Dataset: " + row[0])
                print("Accuracy: \t%s" % (1 - row[1][0, 0]))
                print("Recall: \t%s" % (1 - row[1][1, 0]))

        if os.path.isdir(test_files):
            base = (config["model_type"] + "_" + config["model_name"] + "_"
                    + config["version"])
            write_to_csv(result, os.path.join(test_files,
                                              base + "-results.csv"))
            write_to_csv_time(result, os.path.join(test_files,
                                                   base + "-results-time.csv"))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("-t", "--test", action="store_true")
    parser.add_argument("-l", "--load_model")
    parser.add_argument("-c", "--cpu_mode", action="store_true")
    parser.add_argument("-r", "--reset", action="store_true")
    parser.add_argument("-g", "--use_generator", action="store_true")
    parser.add_argument("-b", "--batch_replication", type=int, default=1)
    args = parser.parse_args(argv)
    run(0, args.config, not args.test, args.load_model, args.cpu_mode,
        args.reset, args.use_generator, args.batch_replication)


if __name__ == "__main__":
    main()
