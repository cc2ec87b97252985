"""Offline localization evaluation config (reference:
snap/configs/eval_localization.py)."""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  """Return the config. Args DSL: ``evaluation_size=256,batch_size=8``."""
  args = defaults.parse_argument_string(
      args_str, evaluation_size=4096, batch_size=4, tag='',
      num_rotations=0, refinement_stages='',
      # Eval-side lift tiling: at the full reference scale batch 4 needs
      # point_tile_eval=288000 to fit one v5e chip's HBM (6.91G tiled vs a
      # 15.79G compile-time OOM untiled; docs/PERFORMANCE.md). Opt-in
      # because merging into a None streetview_encoder (aerial-only runs)
      # would wrongly materialize the modality.
      point_tile_eval=0,
      # 1 enables the sub-bin parabolic peak fit on the refinement fan
      # (model.subcell_refinement) — an eval-time estimator A/B.
      subcell=0)
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
          split='test',
          name_pattern='{}-synthetic_eval',
          loader=defaults.streetview_singlescene(),
      ),
      model=config_dict.create(
          num_pose_samples=20_000,
          num_pose_sampling_retries=8,
          do_grid_refinement=True,
      ),
  )
  config.batch_size = int(args['batch_size'])
  config.data.loader.evaluation_size = int(args['evaluation_size'])
  config.tag = str(args['tag'])
  if int(args['point_tile_eval']):
    with config.unlocked():
      config.model.bev_mapper = config_dict.create(
          streetview_encoder=config_dict.create(
              point_tile_eval=int(args['point_tile_eval'])))
  if int(args['num_rotations']):
    # Dense-backend override: finer coarse rotation bins at eval time.
    config.model.num_rotations = int(args['num_rotations'])
  if int(args['subcell']):
    config.model.subcell_refinement = True
  if args['refinement_stages']:
    # Dense-refinement fan override, e.g. '5x0.25' (one ±5° fan at 0.25°,
    # the default) or '11x1+1.25x0.125' (re-centered two-stage; measured
    # recall-neutral at ~12% eval cost — rotation_ablation.json).
    config.model.dense_refinement_stages = tuple(
        tuple(float(v) for v in stage.split('x'))
        for stage in str(args['refinement_stages']).split('+')
    )
  return config.lock()
