"""Device-mesh construction and sharding helpers.

The trainer runs a single jitted step over a ``jax.sharding.Mesh`` with
NamedSharding annotations (XLA SPMD inserts the collectives over ICI/DCN),
replacing the reference's pmap/psum data parallelism (SURVEY.md §2.7).

Axes:
- ``data``: batch-parallel axis (gradients all-reduce over it);
- ``model``: reserved for tensor-parallel sharding of the widest layers.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import ml_collections
import numpy as np


def make_mesh(
    mesh_config: Optional[ml_collections.ConfigDict] = None,
    devices: Optional[list] = None,
) -> Mesh:
  """Build a mesh from a {axis: size} config; -1 takes remaining devices."""
  devices = devices if devices is not None else jax.devices()
  num = len(devices)
  axes = dict(mesh_config) if mesh_config is not None else {}
  axes.setdefault('data', -1)
  axes.setdefault('model', 1)
  known = int(np.prod([s for s in axes.values() if s != -1]))
  for k, v in axes.items():
    if v == -1:
      axes[k] = num // known
  sizes = tuple(axes.values())
  if int(np.prod(sizes)) != num:
    raise ValueError(f'Mesh {axes} does not match {num} devices.')
  mesh_devices = np.asarray(devices).reshape(sizes)
  return Mesh(mesh_devices, tuple(axes.keys()))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
  """Leading-axis batch sharding over the 'data' mesh axis."""
  return NamedSharding(mesh, P('data'))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
  """Place every array leaf with its batch axis over 'data'."""
  sharding = data_sharding(mesh)
  return jax.device_put(batch, sharding)


def put_host_tree(tree: Any, shardings: Any) -> Any:
  """Place a host-resident pytree (every process holds the FULL values).

  Single-process: plain ``jax.device_put``. Multi-process: ``device_put`` to
  a multi-host sharding needs cross-host transfer support, so each process
  feeds its addressable shards from its full local copy via
  ``jax.make_array_from_process_local_data`` (params/opt state are identical
  across processes — deterministic init from a shared rng).
  ``shardings`` is one Sharding or a matching pytree of them.
  """
  if jax.process_count() == 1:
    return jax.device_put(tree, shardings)

  def put(x, s):
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(s, x, x.shape)

  if isinstance(shardings, jax.sharding.Sharding):
    return jax.tree_util.tree_map(lambda x: put(x, shardings), tree)
  return jax.tree_util.tree_map(put, tree, shardings)


def constrain(x: Any, *spec: Optional[str]) -> Any:
  """Ambient-mesh activation sharding constraint; no-op off-mesh.

  ``spec`` names one mesh axis (or None) per trailing dimension of ``x``;
  leading dims are unconstrained. Axes missing from the ambient mesh (set
  with ``jax.set_mesh``) or of size 1 are dropped, so model code can state
  its TP layout unconditionally: under pure DP this compiles away.

  Example: ``constrain(h, 'model')`` shards an activation's last (feature)
  dim over the 'model' axis next to a tensor-parallel Dense kernel.
  """
  mesh = jax.sharding.get_abstract_mesh()
  axis_sizes = getattr(mesh, 'shape', None) or {}
  spec = tuple(
      s if s is not None and axis_sizes.get(s, 1) > 1 else None
      for s in spec)
  if not any(s is not None for s in spec):
    return x
  ndim = jnp.ndim(x)
  full = jax.sharding.PartitionSpec(
      *([None] * (ndim - len(spec)) + list(spec)))
  return jax.lax.with_sharding_constraint(x, full)


# Single source of truth for "wide enough to tensor-shard": parameter
# sharding (infer_param_shardings) and the activation constraints in model
# code (layers.MLP) must agree, or XLA inserts a reshard around every layer
# on one side of the mismatch. config.tp_min_dim overrides the param side
# only — keep it at this value unless the model constraints are updated too.
TP_MIN_DIM = 256


def infer_param_shardings(
    params: Any, mesh: Mesh, min_dim: int = TP_MIN_DIM
) -> Any:
  """Tensor-parallel sharding rules for parameters.

  Wide kernels (last dim divisible by the 'model' axis and at least
  ``min_dim``) are sharded over 'model'; everything else is replicated. With
  ``model=1`` this degenerates to full replication (pure DP). XLA SPMD
  propagates these shardings into optimizer state and activations and
  inserts the all-gathers/reduce-scatters over ICI.
  """
  model_size = mesh.shape.get('model', 1)

  def rule(p):
    shape = getattr(p, 'shape', ())
    if (
        model_size > 1
        and len(shape) >= 2
        and shape[-1] >= min_dim
        and shape[-1] % model_size == 0
    ):
      spec = P(*([None] * (len(shape) - 1) + ['model']))
      return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())

  return jax.tree_util.tree_map(rule, params)
