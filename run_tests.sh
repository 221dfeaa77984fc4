#!/bin/sh
# Run the test suite on a virtual 8-device CPU mesh.
#
# The container pins JAX_PLATFORMS=axon and pre-registers the TPU backend in
# every interpreter via sitecustomize (PALLAS_AXON_POOL_IPS); tests must not
# touch the real chip, so both are bypassed here. conftest.py then splits the
# CPU into 8 XLA devices for multi-chip sharding tests.
#
# Build the native DIMACS/JSON fast parser first (guarded on a compiler
# being present) so tests/test_native.py runs instead of skipping.
if command -v c++ >/dev/null 2>&1 || command -v g++ >/dev/null 2>&1; then
    make -C "$(dirname "$0")/native" >/dev/null || \
        echo "WARNING: native build failed; test_native.py will skip" >&2
fi
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
