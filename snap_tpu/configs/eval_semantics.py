"""Offline semantics evaluation config (reference:
snap/configs/eval_semantics.py)."""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  """Return the config. Args DSL: ``evaluation_size=256,batch_size=8,tag=-x``
  (mirrors eval_localization.py — the reference protocol default of 10k
  examples is far too slow for checkpoint-cadence evals on one chip)."""
  args = defaults.parse_argument_string(
      args_str, evaluation_size=10_000, batch_size=4, tag='')
  config = config_dict.create(
      workdir=config_dict.placeholder(str),
      checkpoint_step=config_dict.placeholder(int),
      batch_size=4,
      rng_seed=0,
      dtype_str='float32',
      tag='',
      overwrite=False,
      data=config_dict.create(
          rng_seed=0,
          split='val-synthetic',
          name_pattern='{}_semantics_eval',
          loader=defaults.streetview_singlescene(),
      ),
      model=config_dict.create(),
  )
  config.batch_size = int(args['batch_size'])
  config.data.loader.evaluation_size = int(args['evaluation_size'])
  config.tag = str(args['tag'])
  return config.lock()
