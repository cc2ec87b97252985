"""Offline multi-city evaluation with cached npz dumps.

Reference behavior: snap/evaluator.py — per city: rebuild the config by a
3-level merge (defaults < experiment < eval), restore the checkpoint, run the
jitted eval step over the valid split, pack per-example metrics, and dump
``workdir/evaluation/<location><tag>/results.npz`` + ``config.yaml``
(re-read on cache hit). Fixes vs upstream: no hardcoded gpu device
(snap/evaluator.py:190), 'seattle' typo (snap/evaluator.py:42).
"""

from __future__ import annotations

import functools
import io
import pathlib
from typing import Any, Dict, Optional, Tuple

from absl import logging
import jax
import jax.numpy as jnp
from ml_collections import config_dict
import numpy as np

from snap_tpu import models
from snap_tpu.configs import defaults as default_configs
from snap_tpu.data import loader as data_loader
from snap_tpu.models import base
from snap_tpu.parallel import mesh as mesh_lib
from snap_tpu.train_lib import checkpoints
from snap_tpu.utils import configs as config_utils
from snap_tpu.utils import geometry
from snap_tpu.utils import misc

CITIES_SPLITS = {
    'train': default_configs.DATA_SPLITS_CITIES['train'],
    'test': default_configs.DATA_SPLITS_CITIES['test'],
}

ResultDict = Dict[str, np.ndarray]


def compute_distance_view_to_map(
    m_t_vq: geometry.Transform3D, m_t_vm: geometry.Transform3D
) -> Tuple[jax.Array, jax.Array]:
  dr, dt = (m_t_vq.inv @ m_t_vm).magnitude()
  dt_closest = dt.min(-1)
  dr_closest = jnp.take_along_axis(
      dr, jnp.argmin(dt, axis=-1)[..., None], axis=-1).squeeze(-1)
  return dr_closest, dt_closest


def pack_localization_metrics(
    training_metrics: base.MetricsDict,
    losses: base.LossDict,
    data: base.Batch,
    pred: base.Predictions,
) -> base.MetricsDict:
  """Per-example evaluation metrics (batched, no vmap needed)."""
  m_t_vq = data['T_query2map'][..., None] @ data['query']['T_view2scene']
  dr_closest, dt_closest = compute_distance_view_to_map(
      m_t_vq[..., :1], data['map']['T_view2scene']
  )
  return dict(
      error_max_meter=training_metrics['loc/err_max_position'],
      error_max_deg=training_metrics['loc/err_max_rotation'],
      recall_top1=training_metrics['loc/recall_top1'],
      pose_score_max=pred['scores_poses'][..., 1:].max(-1),
      overlap=data['overlap'],
      time_delta_days=data['time_delta_days'],
      closest_map_view_meter=dt_closest,
      closest_map_view_deg=dr_closest,
      loss=losses['total'],
  )


def eval_step(
    params: Any,
    model_state: Any,
    batch: base.Batch,
    *,
    rng: jax.Array,
    model: base.BaseModel,
) -> base.MetricsDict:
  """Evaluate a batch of examples (jitted by the caller)."""
  variables = {'params': params, **model_state}
  pred = model.flax_model.apply(
      variables, batch, train=False, mutable=False,
      rngs={'sampling': rng},
  )
  losses, metrics = model.loss_metrics_function(pred, batch, params)
  match (model_name := type(model).__name__):
    case 'BEVLocalizerModel':
      metrics = pack_localization_metrics(metrics, losses, batch, pred)
    case 'SemanticNetModel':
      metrics = model.pack_evaluation_metrics(metrics, losses, batch, pred)
    case _:
      raise ValueError(f'No packing function for model {model_name}.')
  return metrics


def eval_on_dataset(
    model: base.BaseModel,
    params: Any,
    model_state: Any,
    dataset: data_loader.Dataset,
    rng: jax.Array,
    batch_size: int,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> ResultDict:
  """Run eval over the valid split; returns stacked per-example metrics.

  With a mesh, the batch axis is sharded over 'data' and XLA SPMD runs the
  eval step on all devices — the reference protocol is single-device
  (snap/evaluator.py:282-283), but the 6-city x 4096-example protocol is
  embarrassingly parallel over examples.
  """
  if mesh is not None:
    repl = mesh_lib.replicated(mesh)
    params = mesh_lib.put_host_tree(params, repl)
    model_state = mesh_lib.put_host_tree(model_state, repl)
  eval_step_jit = jax.jit(functools.partial(eval_step, rng=rng, model=model))
  results = []
  num_examples = dataset.meta_data['num_eval_examples']
  num_steps = int(np.ceil(num_examples / batch_size))

  def drain(step, pending_metrics, pending_host, pending_mask):
    metrics = jax.device_get(pending_metrics)
    metrics['vehicle_map'] = pending_host.get(
        'map/vehicle_type', pending_host.get('vehicle_type'))
    if 'pair_id' in pending_host:
      metrics['vehicle_query'] = pending_host['query/vehicle_type']
      metrics['pair_id'] = pending_host['pair_id']
    for i in range(len(pending_mask)):
      if pending_mask[i]:
        results.append(misc.tree_index(metrics, i))
    logging.log_every_n(logging.INFO, 'Evaluated %d/%d examples.', 10,
                        (step + 1) * batch_size, num_examples)

  # One-batch-lag pipeline: dispatch step k+1 before fetching step k's
  # metrics, so the host round-trip overlaps device compute (jax dispatch
  # is async; the device_get of k blocks only until k finishes, while k+1
  # is already queued).
  pending = None
  for step in range(num_steps):
    batch = next(dataset.valid_iter)
    host = batch.pop('_host', {})
    metrics = eval_step_jit(params, model_state, batch)
    mask = np.asarray(batch['batch_mask']) > 0
    if pending is not None:
      drain(step - 1, *pending)
    pending = (metrics, host, mask)
  if pending is not None:
    drain(num_steps - 1, *pending)
  return jax.tree_util.tree_map(lambda *t: np.asarray(t), *results)


def get_model_and_dataset(
    eval_config: config_dict.ConfigDict,
    config: config_dict.ConfigDict,
    workdir: pathlib.Path,
    location: str,
):
  """Load dataset and model for one location, merging configs 3 ways."""
  config.batch_size = eval_config.batch_size

  # Data config precedence: evaluation > experiment > default.
  config_data_xp = config_utils.configs_merge(
      getattr(default_configs, config.data.name)(), config.data
  )
  override_keys = ('voxel_size', 'add_images', 'add_lidar_rays', 'add_rasters',
                   'mode', 'num_views', 'image_size')
  config_data_override = {
      k: config_data_xp.get(k) for k in override_keys if k in config_data_xp
  }
  config.data = config_utils.configs_merge(
      eval_config.data.loader, config_dict.ConfigDict(config_data_override)
  )
  with config.data.unlocked():
    config.data.locations.training = location
    config.data.locations.evaluation = location

  # Shard eval over the data axis when the batch divides the device count.
  mesh = None
  if jax.device_count() > 1 and eval_config.batch_size % jax.device_count(
  ) == 0:
    mesh = mesh_lib.make_mesh(None)

  dataset = data_loader.get_dataset(
      batch_size=eval_config.batch_size,
      eval_batch_size=eval_config.batch_size,
      dataset_configs=config.data,
      mesh=mesh,
      shuffle_seed=eval_config.data.rng_seed,
  )

  dtype = getattr(jnp, eval_config.dtype_str)
  model_class = models.get_model(config.model_name)
  config_model_default = model_class.default_flax_model_config()
  config.model = config_utils.configs_merge(config_model_default, config.model)
  config.model = config_utils.configs_merge(config.model, eval_config.model)
  model = model_class(config.model, dataset.meta_data, dtype)

  raw = checkpoints.restore_raw(workdir, step=eval_config.checkpoint_step)
  params = jax.tree_util.tree_map(
      lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
          jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x),
      raw['params'])
  model_state = raw.get('model_state', {})

  logging.info('Loaded experiment %s at step %s.',
               workdir, raw.get('global_step'))
  with config.unlocked():
    if (step := raw.get('global_step')) is not None:
      # Recorded in the dump so a cache hit can verify it evaluated the
      # requested checkpoint (run_for_location).
      config.eval_checkpoint_step = int(step)
    if (gen := dataset.meta_data.get('generator_kind')) is not None:
      config.data_generator_kind = gen  # dataset identity (ADVICE r2)
  return model, params, model_state, dataset, config, mesh


def write_eval_dump(
    eval_dir: pathlib.Path,
    results: ResultDict,
    config: config_dict.ConfigDict,
    compressed: bool = False,
):
  eval_dir.mkdir(parents=True, exist_ok=True)
  buf = io.BytesIO()
  (np.savez_compressed if compressed else np.savez)(buf, **results)
  (eval_dir / 'results.npz').write_bytes(buf.getvalue())
  config_utils.config_save(eval_dir, config)


def read_eval_dump(
    eval_dir: pathlib.Path,
) -> Tuple[ResultDict, config_dict.ConfigDict]:
  raw = (eval_dir / 'results.npz').read_bytes()
  results = dict(np.load(io.BytesIO(raw), allow_pickle=False))
  config = config_utils.config_load(eval_dir)
  return results, config


def compute_recall(
    errors: np.ndarray, max_error: float
) -> Tuple[np.ndarray, np.ndarray]:
  """Cumulative recall over 100 thresholds in [0, max_error] (percent)."""
  thresholds = np.linspace(0, max_error, 100)
  recall = np.mean(errors < thresholds[:, None], axis=1)
  return thresholds, recall * 100


def run_for_location(
    location: str,
    eval_config: config_dict.ConfigDict,
    fail_if_missing: bool = False,
) -> Tuple[ResultDict, config_dict.ConfigDict]:
  """Evaluate one location, reusing a cached dump when present."""
  workdir = pathlib.Path(eval_config.workdir)
  experiment_config = config_utils.config_load(workdir)
  eval_path = workdir / 'evaluation' / f'{location}{eval_config.tag}'
  if (eval_path / 'results.npz').exists() and not eval_config.overwrite:
    results, dump_config = read_eval_dump(eval_path)
    # The cache is keyed by location+tag only; guard against silently
    # returning a dump computed under a different protocol (e.g. a 256-
    # example quick eval masquerading as the full 4096-example run, or a
    # different checkpoint step). A dump without a recorded step cannot
    # satisfy an explicit checkpoint_step request.
    requested_size = eval_config.data.loader.get('evaluation_size')
    dumped_size = len(next(iter(results.values())))
    size_ok = requested_size is None or dumped_size == requested_size
    dumped_step = dump_config.get('eval_checkpoint_step')
    step_ok = (eval_config.checkpoint_step is None
               or dumped_step == eval_config.checkpoint_step)
    if size_ok and step_ok:
      logging.info('Loading cached dump from %s.', eval_path)
      return results, dump_config
    # Never clobber the existing dump with a different-protocol rerun (a
    # cheap quick eval would silently destroy an expensive full-protocol
    # dump): divert this run to a protocol-qualified path.
    qualified = (f'{location}{eval_config.tag}'
                 f'-n{requested_size}-s{eval_config.checkpoint_step}')
    logging.warning(
        'Cached dump at %s does not match the requested protocol '
        '(%d examples dumped vs %s requested; checkpoint step %s vs %s) — '
        'recomputing into %s (set overwrite=True to replace the dump).',
        eval_path, dumped_size, requested_size,
        dumped_step, eval_config.checkpoint_step, qualified)
    eval_path = workdir / 'evaluation' / qualified
    if (eval_path / 'results.npz').exists() and (
        eval_config.checkpoint_step is not None):
      # The qualified name pins size+step, so this cache needs no recheck
      # (a step=None qualified dump tracks 'latest', which moves — recompute).
      results, dump_config = read_eval_dump(eval_path)
      logging.info('Loading cached dump from %s.', eval_path)
      return results, dump_config
  if fail_if_missing:
    raise ValueError(f'Missing dump for {workdir} at {eval_path}.')
  model, params, model_state, dataset, config, mesh = get_model_and_dataset(
      eval_config, experiment_config, workdir, location
  )
  results = eval_on_dataset(
      model, params, model_state, dataset,
      jax.random.PRNGKey(eval_config.rng_seed),
      eval_config.batch_size,
      mesh=mesh,
  )
  write_eval_dump(eval_path, results, config)
  logging.info('Evaluation results written to %s.', eval_path)
  return results, config


def run(
    config: config_dict.ConfigDict, **kwargs
) -> Dict[str, Tuple[ResultDict, config_dict.ConfigDict]]:
  """Evaluate on multiple locations sequentially."""
  split = config.data.split
  if split is None:
    raise ValueError('Split is required but is None.')
  cities = CITIES_SPLITS.get(split, split.split(','))
  logging.info('Running evaluation for cities %s.', cities)
  results = {}
  for city in cities:
    location = config.data.name_pattern.format(city)
    logging.info('Running evaluation for location %s.', location)
    results[city] = run_for_location(location, config, **kwargs)
  return results
