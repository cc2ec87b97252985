"""Tiny semantics-eval config for CPU smoke runs of the evaluator CLI."""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  del args_str
  config = config_dict.create(
      workdir=config_dict.placeholder(str),
      checkpoint_step=config_dict.placeholder(int),
      batch_size=2,
      rng_seed=0,
      dtype_str='float32',
      tag='',
      overwrite=False,
      data=config_dict.create(
          rng_seed=0,
          split='smokeville',
          name_pattern='{}_semantics_eval',
          loader=defaults.streetview_singlescene(),
      ),
      model=config_dict.create(),
  )
  config.data.loader.evaluation_size = 4
  return config.lock()
