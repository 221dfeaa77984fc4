"""Persistent XLA compilation cache.

The solver pipeline compiles a deterministic ladder of programs (bucketed
shapes, fixed chunk sizes), byte-identical across runs; on the tunneled TPU
backend each compile costs seconds to minutes, so a cold bench burned ~178s
of warm-up recompiling programs it had already built the run before
(BENCH_r02.json warmup_s). The reference pays zero compile cost (eager
torch); the TPU-native answer is JAX's persistent compilation cache keyed
on program fingerprint + topology.

Wired into bench.py, every CLI (cli/satyr.py, cli/satyr_train_test.py) and
the training tools. Controlled by env:

  PDP_COMPILE_CACHE       cache directory (default ~/.cache/pdp_solver_tpu/xla,
                          "0"/"off" disables)
  PDP_COMPILE_CACHE_MIN_S min compile seconds worth caching (default 0.5)
"""

import os

_ENABLED = False


def enable_compilation_cache(path=None, min_compile_s=None):
    """Idempotently enable the persistent compilation cache. Safe to call
    before or after backend initialisation (the cache is consulted at
    compile time, not at backend init)."""
    global _ENABLED
    if _ENABLED:
        return True
    env = os.environ.get("PDP_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disabled"):
        return False
    path = path or env or os.path.expanduser("~/.cache/pdp_solver_tpu/xla")
    if min_compile_s is None:
        min_compile_s = float(os.environ.get("PDP_COMPILE_CACHE_MIN_S", 0.5))
    os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_s))
    # cache every entry regardless of expected runtime-vs-compile tradeoff
    # heuristics: on the tunneled backend ALL recompiles are expensive
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except AttributeError:  # older jax without the knob
        pass
    _ENABLED = True
    return True
