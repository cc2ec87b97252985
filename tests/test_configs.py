"""Config-system smoke tests: every experiment config must build."""

import pytest
from ml_collections import config_dict

from snap_tpu.configs import defaults
from snap_tpu.configs import eval_localization
from snap_tpu.configs import eval_semantics
from snap_tpu.configs import smoke_eval_localization
from snap_tpu.configs import smoke_localization
from snap_tpu.configs import smoke_occupancy
from snap_tpu.configs import smoke_semantics
from snap_tpu.configs import train_localization
from snap_tpu.configs import train_occupancy
from snap_tpu.configs import train_semantics
from snap_tpu.utils import configs as config_utils


@pytest.mark.parametrize('module', [
    smoke_localization, smoke_semantics, smoke_occupancy,
    train_localization, train_semantics, train_occupancy,
    eval_localization, eval_semantics, smoke_eval_localization,
])
def test_config_builds(module):
  config = module.get_config()
  assert isinstance(config, config_dict.ConfigDict)


def test_localization_args_dsl():
  config = train_localization.get_config('image_encoder=R152x2')
  enc = config.model.bev_mapper.streetview_encoder.image_encoder.encoder
  assert enc.depth == 152 and enc.width == 2
  assert config.num_training_steps == 200_000


def test_aerial_only_gets_query_mapper():
  config = train_localization.get_config('modalities=aerial')
  assert config.model.bev_mapper.streetview_encoder is None
  assert config.model.bev_mapper_query is not None
  assert config.model.bev_mapper_query.streetview_encoder is not None


def test_train_localization_recipe_args():
  """pretrained_resnet warm-start + bev_net opt-in (reference ramp:
  snap/models/resnet.py:223-233; declared-only slot:
  snap/models/bev_mapper.py:141-142)."""
  config = train_localization.get_config(
      'scale=small,bev_net=1,pretrained_resnet=/tmp/bit.npz')
  enc = config.model.bev_mapper.streetview_encoder.image_encoder.encoder
  assert enc.pretrained_path == '/tmp/bit.npz'
  assert config.model.bev_mapper.bev_net.num_units == 2
  # Defaults: from scratch, no bev_net.
  config = train_localization.get_config('scale=small')
  assert config.model.bev_mapper.bev_net is None
  enc = config.model.bev_mapper.streetview_encoder.image_encoder.encoder
  assert enc.pretrained_path is None


def test_lr_field_references_propagate():
  config = train_localization.get_config()
  assert config.lr_configs.start_decay_step == config.num_training_steps // 2
  config.num_training_steps = 100
  assert config.lr_configs.start_decay_step == 50


def test_eval_localization_args_dsl():
  config = eval_localization.get_config(
      'num_rotations=128,refinement_stages=5x0.25,tag=-abl')
  assert config.model.num_rotations == 128
  assert config.model.dense_refinement_stages == ((5.0, 0.25),)
  assert config.tag == '-abl'
  config = eval_localization.get_config('refinement_stages=11x1+1.25x0.125')
  assert config.model.dense_refinement_stages == ((11.0, 1.0), (1.25, 0.125))
  # No override: the experiment/default stages must survive the merge.
  assert 'dense_refinement_stages' not in eval_localization.get_config().model


def test_eval_point_tile_eval_merges_into_experiment_model():
  """point_tile_eval=N reaches the experiment's streetview encoder through
  the evaluator's 3-level merge without clobbering its other fields."""
  from snap_tpu.utils import configs as config_utils

  eval_config = eval_localization.get_config('point_tile_eval=288000')
  exp = train_localization.get_config('scale=small')
  merged = config_utils.configs_merge(exp.model, eval_config.model)
  sv = merged.bev_mapper.streetview_encoder
  assert sv.point_tile_eval == 288000
  assert sv.image_encoder is not None  # untouched sibling fields survive
  # Default: no override key at all.
  assert 'bev_mapper' not in eval_localization.get_config().model


def test_parse_argument_string():
  args = defaults.parse_argument_string('image_encoder=R101')
  assert args == {'image_encoder': 'R101', 'modalities': 'streetview+aerial',
                  'pose_backend': 'ransac', 'scale': 'full'}
  with pytest.raises(ValueError):
    defaults.parse_argument_string('bogus=1')


class TestConfigUtils:

  def test_merge_overrides(self):
    a = config_dict.ConfigDict({'x': 1, 'sub': {'y': 2, 'z': 3}})
    b = config_dict.ConfigDict({'sub': {'y': 20}})
    merged = config_utils.configs_merge(a, b)
    assert merged.x == 1 and merged.sub.y == 20 and merged.sub.z == 3
    assert a.sub.y == 2  # merge is non-destructive

  def test_merge_none_initialized_field(self):
    a = config_dict.ConfigDict(
        {'sub': config_dict.placeholder(config_dict.ConfigDict)})
    b = config_dict.ConfigDict({'sub': {'y': 1}})
    merged = config_utils.configs_merge(a, b)
    assert merged.sub.y == 1

  def test_diff(self):
    a = config_dict.ConfigDict({'x': 1, 'sub': {'y': 2}})
    b = config_dict.ConfigDict({'x': 1, 'sub': {'y': 3}})
    diff = config_utils.config_diff(a, b)
    assert diff == {'sub': {'y': (2, 3)}}
    assert config_utils.config_diff(a, a) == {}

  def test_save_load_roundtrip(self, tmp_path):
    config = smoke_localization.get_config()
    config_utils.config_save(tmp_path, config)
    loaded = config_utils.config_load(tmp_path)
    assert loaded.model_name == 'bev_localizer'
    assert loaded.batch_size == config.batch_size
    assert not config_utils.config_diff(
        config_dict.ConfigDict({'model': config.model.to_dict()}),
        config_dict.ConfigDict({'model': loaded.model.to_dict()}))


class TestPretrainedMapperRecipes:
  """pretrained_mapper=<workdir> recipes adopt the frozen experiment's
  mapper config + scene geometry verbatim (param shapes must match the
  checkpoint being adopted)."""

  def _fake_workdir(self, tmp_path):
    pre = smoke_localization.get_config()
    config_utils.config_save(tmp_path, pre)
    return pre

  def test_semantics_pretrained_mapper(self, tmp_path):
    from snap_tpu.configs import train_semantics
    pre = self._fake_workdir(tmp_path)
    cfg = train_semantics.get_config(
        f'scale=small,pretrained_mapper={tmp_path}')
    assert cfg.model.bev_mapper.pretrained_path == str(tmp_path)
    assert cfg.model.bev_mapper.matching_dim == pre.model.bev_mapper.matching_dim
    assert cfg.data.voxel_size == pre.data.voxel_size
    assert cfg.data.num_views == pre.data.num_views
    assert tuple(cfg.data.image_size) == tuple(pre.data.image_size)
    assert cfg.optimizer_configs.allocate_frozen_state is False
    assert cfg.num_training_steps == 3_000
    # The in-loop eval lift must be tiled (round-4 run_sem_head OOM): the
    # eval-side tile follows the mapper's training tile.
    sve = cfg.model.bev_mapper.streetview_encoder
    assert sve.point_tile_eval == (sve.get('point_tile') or 288_000)

  def test_occupancy_pretrained_mapper(self, tmp_path):
    from snap_tpu.configs import train_occupancy
    pre = self._fake_workdir(tmp_path)
    cfg = train_occupancy.get_config(
        f'scale=small,pretrained_mapper={tmp_path}')
    assert cfg.model.streetview_encoder.pretrained_path == str(tmp_path)
    assert (cfg.model.streetview_encoder.feature_dim
            == pre.model.bev_mapper.streetview_encoder.feature_dim)
    # Eval-side lift tiling (round-4 run_sem_head OOM, occupancy twin).
    sv = cfg.model.streetview_encoder
    assert sv.point_tile_eval == (sv.get('point_tile') or 288_000)
    assert cfg.data.voxel_size == pre.data.voxel_size
    assert cfg.data.num_rays == 4_000

  def test_localization_pretrained_mapper_warm_start(self):
    from snap_tpu.configs import train_localization
    cfg = train_localization.get_config(
        'scale=full1chip,pose_backend=exhaustive,'
        'pretrained_mapper=pretrained/full1chip')
    assert cfg.model.bev_mapper.pretrained_path == 'pretrained/full1chip'
    # Default stays from-scratch: the arg must not perturb the live recipe.
    cfg = train_localization.get_config(
        'scale=full1chip,pose_backend=exhaustive')
    assert cfg.model.bev_mapper.pretrained_path is None

  def test_localization_continue_step_schedule(self):
    """continue_step=N resumes the 20k recipe's LR tail from an export."""
    import math

    from snap_tpu.configs import train_localization
    from snap_tpu.train_lib import lr_schedules

    cfg = train_localization.get_config(
        'scale=full1chip,pose_backend=exhaustive,'
        'pretrained_mapper=pretrained/full1chip,continue_step=7000')
    assert cfg.num_training_steps == 13_000
    # Exact tail (ADVICE r4): base LR and cycle stay the original's; the
    # decay origin shifts back by cs so lr(s) == lr_original(cs + s).
    assert abs(cfg.lr_configs.base_learning_rate - 2e-4) < 1e-12
    assert cfg.lr_configs.start_decay_step == 4_000 - 7_000
    assert cfg.lr_configs.steps_per_cycle == 16_000
    fn = lr_schedules.get_learning_rate_fn(cfg)

    def orig(step):  # the uninterrupted 20k recipe's LR
      frac = min(1.0, max(0.0, (step - 4_000) / 16_000))
      return 2e-4 * min(1.0, step / 1_000) * 0.5 * (
          1 + math.cos(math.pi * frac))

    # Past the 100-step re-warmup the tail matches the original exactly —
    # including mid-tail (the round-4 re-phased approximation ran ~30%
    # hotter at effective step 13500).
    for local in (100, 500, 6_500, 12_000):
      assert abs(float(fn(local)) - orig(7_000 + local)) < 1e-10, local
    assert float(fn(13_000)) < 1e-9
    # During re-warmup the LR ramps linearly toward the tail value.
    assert abs(float(fn(50)) - 0.5 * orig(7_050)) < 1e-10
    # Fresh data order: the shuffle seed must differ from the original run.
    base = train_localization.get_config(
        'scale=full1chip,pose_backend=exhaustive')
    assert cfg.shuffle_seed != base.shuffle_seed
    assert base.num_training_steps == 20_000

  def test_localization_continue_step_validation(self):
    """continue_step fails fast on misuse (ADVICE r4)."""
    import pytest

    from snap_tpu.configs import train_localization

    with pytest.raises(ValueError, match='pretrained_mapper'):
      train_localization.get_config('scale=full1chip,continue_step=7000')
    with pytest.raises(ValueError, match='full1chip'):
      train_localization.get_config(
          'scale=small,pretrained_mapper=x,continue_step=7000')
    with pytest.raises(ValueError, match='20000'):
      train_localization.get_config(
          'scale=full1chip,pretrained_mapper=x,continue_step=20000')

  def test_occupancy_batch_size_override(self, tmp_path):
    from snap_tpu.configs import train_occupancy
    self._fake_workdir(tmp_path)
    cfg = train_occupancy.get_config(
        f'scale=small,pretrained_mapper={tmp_path},batch_size=2')
    assert cfg.batch_size == 2
    # 0 keeps the per-scale default.
    cfg = train_occupancy.get_config('scale=small,batch_size=0')
    assert cfg.batch_size == 4
