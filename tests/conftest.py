"""Test configuration: run on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8'
  ).strip()

import jax  # noqa: E402  (import after env setup)

# The forced-host CPU backend uses low-precision matmul accumulation by
# default; pin the precision so numeric tests check semantics, not noise.
jax.config.update('jax_default_matmul_precision', 'highest')
