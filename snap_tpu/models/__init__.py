"""Model registry (reference: snap/models/__init__.py)."""

import importlib
from typing import Any, Type

from snap_tpu.models import base

BASEPATH = 'snap_tpu.models.{}'

MODELS = {
    'occupancy_net': ('occupancy_net', 'OccupancyNetModel'),
    'semantic_net': ('semantic_net', 'SemanticNetModel'),
    'bev_localizer': ('bev_localizer', 'BEVLocalizerModel'),
}


def get_class(modulename: str, classname: str) -> Any:
  return getattr(importlib.import_module(BASEPATH.format(modulename)),
                 classname)


def get_model(name: str) -> Type[base.BaseModel]:
  """Get a top-level model class by registry name."""
  return get_class(*MODELS[name])
