"""Regression: GT semantic masks must give every exclusive class argmax
support.

Round-5 finding (results/run_sem_head_r5, commit 8295f09): the original
generators built GT class masks as nested superlevel sets of one texture
channel, so ``jnp.argmax(masks, -1)`` (semantic_net._create_exclusive_labels,
matching the reference's label construction in
/root/reference/snap/models/semantic_net.py:318-360) labeled 97.8% of cells
as the first class and pinned building/road/terrain/tree recalls at 0.0.
The fix partitions each texture channel into level BANDS — same-channel
masks are disjoint, so every class owns a band of cells. These tests pin
the health property on BOTH generators (host numpy + on-device jitted) so
a future texture/threshold change cannot silently re-degenerate head
supervision.
"""

import jax
import numpy as np

from snap_tpu.data import loader as data_loader
from snap_tpu.configs import defaults


def _data_config(on_device):
  config = defaults.streetview_singlescene()
  with config.unlocked():
    config.update(dict(
        locations=dict(training='x-synthetic'),
        mode='pair_scene_view',
        voxel_size=0.8,
        add_images=True,
        add_rasters=True,
        evaluation_size=6,
        num_views=3,
        image_size=(24, 32),
        num_workers=1,
        on_device_generation=on_device,
    ))
  return config


def _gt_masks(on_device):
  ds = data_loader.get_dataset(
      batch_size=4, eval_batch_size=4, dataset_configs=_data_config(on_device),
      mesh=None, shuffle_seed=11, start_step=0)
  batch = next(ds.train_iter)
  gt = np.asarray(jax.device_get(batch['map']['rasters']['gt_semantics']))
  classes = ds.meta_data['semantic_classes_gt']
  assert gt.shape[-1] == len(classes)
  return gt.reshape(-1, gt.shape[-1]).astype(bool), list(classes)


def _check_health(masks, classes):
  n = masks.shape[0]
  freq = masks.mean(0)
  # Every class must own real cells: the degenerate pre-fix labels gave
  # later same-channel classes ~0 support (subsets swallowed by argmax).
  for name, f in zip(classes, freq):
    assert f > 0.005, f'class {name!r} mask frequency {f:.4f} — no support'
    assert f < 0.70, f'class {name!r} mask frequency {f:.4f} — degenerate'
  # The exclusive-label argmax must not collapse onto one class. Build the
  # labels the way the head does for its area group (first-True argmax).
  sem_cfg = defaults.semantic_net()
  for group in (tuple(sem_cfg.area_classes),
                tuple(sem_cfg.object_classes_exclusive)):
    idx = [classes.index(c) for c in group]
    sub = masks[:, idx]
    valid = sub.any(-1)
    labels = sub.argmax(-1)[valid]
    counts = np.bincount(labels, minlength=len(group)) / max(len(labels), 1)
    assert counts.max() < 0.9, (
        f'argmax labels collapse: {dict(zip(group, counts.round(3)))}')
    # every class in the group appears in the argmax labeling
    for name, c in zip(group, counts):
      assert c > 0.005, (
          f'{name!r} has no argmax support: '
          f'{dict(zip(group, counts.round(3)))}')


def test_host_generator_gt_labels_healthy():
  _check_health(*_gt_masks(on_device=False))


def test_device_generator_gt_labels_healthy():
  _check_health(*_gt_masks(on_device=True))
