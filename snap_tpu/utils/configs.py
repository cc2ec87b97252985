"""Experiment-configuration helpers: merge / diff / save / load.

Capability parity with the reference (snap/utils/configs.py): recursive update
that tolerates None-initialized dict fields and FieldReferences, config diffs
for fine-tuning warnings, and YAML round-tripping of ``workdir/config.yaml``.
"""

from __future__ import annotations

import copy
import importlib
import importlib.util
import os
import pathlib
from typing import Any

from ml_collections import config_dict
import yaml


def load_config_module(config_flag: str) -> config_dict.ConfigDict:
  """Load ``get_config`` from '<file-or-module-path>[:<args>]'."""
  path, _, args_str = config_flag.partition(':')
  if path.endswith('.py') and os.path.exists(path):
    spec = importlib.util.spec_from_file_location('experiment_config', path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
  else:
    module = importlib.import_module(path.removesuffix('.py'))
  try:
    return module.get_config(args_str or None)
  except TypeError:
    return module.get_config()


def config_update(self: config_dict.ConfigDict, other: config_dict.ConfigDict):
  """Recursive update supporting dict fields initialized as None."""
  iteritems_kwargs = {}
  if isinstance(other, config_dict.ConfigDict):
    iteritems_kwargs['preserve_field_references'] = True
  for key, value in other.iteritems(**iteritems_kwargs):
    if key not in self or value is None:
      self[key] = value
      continue
    value_self = self._fields[key]  # pylint: disable=protected-access
    if isinstance(value_self, config_dict.FieldReference) and isinstance(
        value, config_dict.FieldReference
    ):
      if value.get() is not None:
        type_ = value_self.get_type()
        if value.get_type() != type_:
          raise TypeError(
              'Cannot update a FieldReference from another FieldReference for'
              f' key {key}: mismatched types ({type_} vs {value.get_type()})'
          )
      self[key] = value
    elif isinstance(self[key], config_dict.ConfigDict) and isinstance(
        value, config_dict.ConfigDict
    ):
      # self[key] dereferences FieldReferences: a subtree declared as a
      # ConfigDict *placeholder* (e.g. model.bev_mapper) and later assigned
      # must be recursively updated, not wholesale-replaced — otherwise a
      # partial eval-config override (one nested field) silently drops
      # every sibling field of the experiment's subtree.
      config_update(self[key], value)
    else:
      self[key] = value


def configs_merge(
    a: config_dict.ConfigDict, b: config_dict.ConfigDict
) -> config_dict.ConfigDict:
  """Equivalent to ``a | b`` for ConfigDicts (b wins)."""
  a = copy.deepcopy(a)
  config_update(a, b)
  return a


def config_diff(
    a: config_dict.ConfigDict, b: config_dict.ConfigDict
) -> dict[str, Any]:
  """Nested dict of (a_value, b_value) for keys whose values differ."""
  keys = set(list(a.keys()) + list(b.keys()))
  diff = {}
  for key in sorted(keys):
    va = a.get(key)
    vb = b.get(key)
    if va == vb:
      continue
    if isinstance(va, config_dict.ConfigDict) and isinstance(
        vb, config_dict.ConfigDict
    ):
      d = config_diff(va, vb)
      if d:
        diff[key] = d
    else:
      diff[key] = (va, vb)
  return diff


def config_load(workdir: str | pathlib.Path) -> config_dict.ConfigDict:
  path = pathlib.Path(workdir) / 'config.yaml'
  return config_dict.ConfigDict(yaml.unsafe_load(path.read_text()))


def config_save(workdir: str | pathlib.Path, config: config_dict.ConfigDict):
  workdir = pathlib.Path(workdir)
  workdir.mkdir(parents=True, exist_ok=True)
  (workdir / 'config.yaml').write_text(config.to_yaml())
