"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (the JAX-native fake-distributed-backend analogue).

Note: the axon sitecustomize registers the TPU backend at interpreter start
and overrides JAX_PLATFORMS, so we must force the platform through
jax.config before any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
