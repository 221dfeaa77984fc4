"""PDP-Solver-TPU: a TPU-native Propagation-Decimation-Prediction SAT framework.

A from-scratch JAX/XLA/Pallas re-design of the PDP constraint-satisfaction
paradigm (reference: microsoft/PDP-Solver, arXiv:1903.01969). CNF batches are
compiled into padded edge-list factor graphs with static bucketed shapes; all
propagation / decimation / prediction math runs as segment ops and fused
kernels under `jax.jit`, with data-dependent control flow expressed as masked
`lax.while_loop` fixed points (zero host syncs in the hot loop).

Layout:
  fg/        factor-graph compiler: DIMACS/JSON -> packed tensors, bucketing,
             CNF generators (replaces reference src/dimacs2json.py + dataset.py)
  ops/       segment-reduce algebra + Pallas kernels (replaces the
             torch.sparse/cuSPARSE backend of reference src/pdp/nn/util.py)
  problem/   functional SATProblem state + simplification fixed points
             (replaces reference src/pdp/nn/solver.py:SATProblem)
  modules/   propagators / decimators / predictors as pure functions
             (replaces reference src/pdp/nn/pdp_{propagate,decimate,predict}.py)
  solvers/   the six solver assemblies + WalkSAT local search
             (replaces reference src/pdp/nn/solver.py solver classes)
  train/     energy loss, trainer orchestration, checkpointing
             (replaces reference src/pdp/factorgraph/base.py + trainer.py)
  parallel/  device-mesh sharding, multi-chip training/inference steps
             (replaces reference nn.DataParallel usage, base.py:93-97)
  cli/       satyr / satyr-train-test / dimacs2json compatible entry points
"""

__version__ = "0.1.0"
