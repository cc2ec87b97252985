"""Pytree and batch-dictionary helpers (reference: snap/utils/misc.py)."""

from __future__ import annotations

from typing import Any, Callable, Iterable

import flax
import jax
import jax.numpy as jnp
import numpy as np


def tree_combine(op: Callable[[Iterable[Any]], Any], trees: Iterable[Any]):
  return jax.tree_util.tree_map(lambda *t: op(t), *trees)


def tree_stack(trees: Iterable[Any]):
  return tree_combine(jnp.stack, trees)


def tree_index(tree: Any, i: Any):
  return jax.tree_util.tree_map(lambda x: x[i], tree)


def filter_dict(
    d: dict[str, Any], filter_fn: Callable[[str, Any], bool]
) -> dict[str, Any]:
  """Filter out elements of a nested dictionary."""
  flat = flax.traverse_util.flatten_dict(d)
  flat = filter(lambda kv: filter_fn(kv[0], kv[1]), flat.items())
  return flax.traverse_util.unflatten_dict(dict(flat))


def is_string_array(x: Any) -> bool:
  return isinstance(x, np.ndarray) and x.dtype.type in (np.str_, np.object_)


def filter_batch_for_jit(batch: dict[str, Any]) -> dict[str, Any]:
  """Exclude string arrays from a batch nested dictionary.

  Unlike the reference (snap/utils/misc.py:48-54) our data pipeline keeps
  strings in a host-side side channel, but we keep this utility for
  compatibility with user-supplied batches.
  """
  return filter_dict(batch, lambda _, v: not is_string_array(v))


def find_nested_dict(tree: dict[str, Any], target_key: str):
  """Find a sub-dict by key anywhere in a nested dict (checkpoint subtrees)."""
  for k, v in tree.items():
    if isinstance(v, dict):
      if k == target_key:
        return v
      ret = find_nested_dict(v, target_key)
      if ret is not None:
        return ret
  return None
