#!/bin/sh
# Run the test suite on a virtual 8-device CPU mesh.
#
# The container pins JAX_PLATFORMS=axon and pre-registers the TPU backend in
# every interpreter via sitecustomize (PALLAS_AXON_POOL_IPS); tests must not
# touch the real chip, so both are bypassed here. conftest.py then splits the
# CPU into 8 XLA devices for multi-chip sharding tests.
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
