"""Test config: force the CPU backend with 8 virtual devices and enable x64.

Tests must not depend on TPU hardware; the multi-chip sharding tests run on a
virtual 8-device CPU mesh, and bit-exactness tests need float64.

Note: this environment pre-imports jax in sitecustomize (axon PJRT plugin),
so env vars like JAX_PLATFORMS are snapshotted before conftest runs — the
platform must be overridden through jax.config instead.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
