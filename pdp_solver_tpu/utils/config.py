"""YAML config loading with the reference's key names and merge semantics.

The reference merges a YAML model config with argparse args into one flat dict
(src/satyr.py:64-101, src/satyr-train-test.py:42-43) - no schema, last writer
wins. Kept as-is so the reference's config/ directory can be consumed
verbatim; a light validation layer catches typos early.
"""

import logging

import yaml

KNOWN_MODEL_TYPES = ("np-nd-np", "p-nd-np", "np-d-np", "p-d-p", "walk-sat",
                     "reinforce")


def load_yaml_config(path):
    with open(path, "r") as f:
        return yaml.safe_load(f)


def merge_config(model_config: dict, args: dict) -> dict:
    """args override the YAML (reference `{**model_config, **args}`)."""
    return {**model_config, **args}


def apply_classical_overrides(config: dict) -> dict:
    """Reference satyr.py:92-101: classical solvers carry no weights and use
    hidden_dim=3 (the SP message width); walk-sat spends its whole iteration
    budget on local search."""
    config = dict(config)
    if config["model_type"] in ("p-d-p", "walk-sat", "reinforce"):
        config["model_path"] = None
        config["hidden_dim"] = 3
    if config["model_type"] == "walk-sat":
        config["local_search_iteration"] = config["test_recurrence_num"]
    config.setdefault("dropout", 0)
    config.setdefault("error_dim", 1)
    config.setdefault("exploration", 0)
    return config


def validate(config: dict):
    if config.get("model_type") not in KNOWN_MODEL_TYPES:
        raise ValueError(
            f"model_type must be one of {KNOWN_MODEL_TYPES}, "
            f"got {config.get('model_type')!r}")
    return config


def make_logger(name):
    fmt = "[%(levelname)s] %(asctime)s - %(name)s: %(message)s"
    logging.basicConfig(level=logging.DEBUG, format=fmt)
    return logging.getLogger(name)
