"""Test configuration: run on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends.
"""

import os

# The harness presets JAX_PLATFORMS=axon (remote TPU tunnel); unit tests must
# run on the local virtual CPU mesh — override unconditionally (opt out via
# SNAP_TEST_PLATFORM).
os.environ['JAX_PLATFORMS'] = os.environ.get('SNAP_TEST_PLATFORM', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8'
  ).strip()

import jax  # noqa: E402  (import after env setup)

# The axon sitecustomize force-sets jax_platforms='axon,cpu' via
# config.update (which outranks env vars); override it back to CPU for tests.
jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

# The forced-host CPU backend uses low-precision matmul accumulation by
# default; pin the precision so numeric tests check semantics, not noise.
jax.config.update('jax_default_matmul_precision', 'highest')

# Cache compiled executables across test runs (model tests jit whole stacks).
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
