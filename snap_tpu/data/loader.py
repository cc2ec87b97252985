"""Data pipeline: synthetic builder -> batched, typed, device-placed iterators.

Re-design of the reference tf.data/TFDS pipeline (snap/data/loader.py) around
the synthetic generator:

- worker threads build numpy examples and batches (the host-side analogue of
  tf.data's threadpool);
- ``process_batch`` wraps pose/intrinsics dicts into Transform3D /
  FisheyeCamera pytrees so batches carry typed geometry into jit;
- strings never enter the device path: they live under the ``_host`` key and
  are stripped before device placement (the reference instead threads string
  arrays around jit, snap/utils/misc.py:48-54);
- batches are placed on the mesh with a NamedSharding (batch axis over
  'data') by an async double-buffered prefetcher — the jit+sharding
  equivalent of flax's prefetch_to_device.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import queue as queue_lib
import threading
from typing import Any, Callable, Dict, Iterator, Optional

from absl import logging
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from snap_tpu.data import device_synthetic
from snap_tpu.data import synthetic
from snap_tpu.data import types
from snap_tpu.utils import geometry
from snap_tpu.utils import grids

DataDict = Dict[str, Any]


@dataclasses.dataclass
class Dataset:
  """Train/eval iterators + metadata (mirrors scenic's Dataset tuple)."""

  train_iter: Optional[Iterator[DataDict]]
  valid_iter: Optional[Iterator[DataDict]]
  test_iter: Optional[Iterator[DataDict]]
  meta_data: Dict[str, Any]


def process_scene_batch(batch: DataDict) -> DataDict:
  """Wrap stacked pose/intrinsics dicts into typed geometry pytrees."""
  batch = dict(batch)
  batch['camera'] = geometry.FisheyeCamera.from_dict(batch['camera'])
  batch['T_view2scene'] = geometry.Transform3D(**batch['T_view2scene'])
  return batch


def process_batch(batch: DataDict, mode: types.DataMode) -> DataDict:
  """Typed-geometry wrapping per data mode; strings to the _host side-channel."""
  host: DataDict = {}
  if mode == types.DataMode.SINGLE_SCENE:
    host['scene_id'] = batch.pop('scene_id')
    host['vehicle_type'] = batch.pop('vehicle_type')
    batch = process_scene_batch(batch)
  elif mode == types.DataMode.PAIR_SCENE_VIEW:
    for k in ('map', 'query'):
      scene = dict(batch[k])
      host[f'{k}/scene_id'] = scene.pop('scene_id')
      host[f'{k}/vehicle_type'] = scene.pop('vehicle_type')
      batch[k] = process_scene_batch(scene)
    batch['T_query2map'] = geometry.Transform3D(**batch['T_query2map'])
    host['pair_id'] = batch.pop('pair_id')
  elif mode == types.DataMode.PAIR_SCENES:
    for k in ('scene_i', 'scene_j'):
      scene = dict(batch[k])
      host[f'{k}/scene_id'] = scene.pop('scene_id')
      host[f'{k}/vehicle_type'] = scene.pop('vehicle_type')
      batch[k] = process_scene_batch(scene)
    batch['T_j2i'] = geometry.Transform3D(**batch['T_j2i'])
  else:
    raise NotImplementedError(mode)
  batch['_host'] = host
  return batch


def _stack_examples(examples: list[DataDict]) -> DataDict:
  def stack(*xs):
    if isinstance(xs[0], str):
      return np.asarray(xs)
    return np.stack(xs)

  return jax.tree_util.tree_map(stack, *examples)


def split_host_data(batch: DataDict) -> tuple[DataDict, DataDict]:
  batch = dict(batch)
  host = batch.pop('_host', {})
  return batch, host


def put_global_batch(
    batch: DataDict, sharding: jax.sharding.Sharding
) -> DataDict:
  """Place a (process-local) batch on the mesh as global arrays.

  Single-process: a plain sharded ``device_put``. Multi-process: each process
  holds its contiguous block of the global batch; leaves are assembled into
  global arrays with ``jax.make_array_from_process_local_data`` (the
  jit/Mesh equivalent of the reference's per-host tf.data sharding +
  ``device_put_sharded``, snap/data/loader.py:266,51).
  """
  if jax.process_count() == 1:
    return jax.device_put(batch, sharding)

  def put(x):
    x = np.asarray(x)
    global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
    return jax.make_array_from_process_local_data(sharding, x, global_shape)

  return jax.tree_util.tree_map(put, batch)


class _PrefetchIterator:
  """Worker threads building batches in order; buffered device placement.

  ``num_workers`` threads build batches concurrently (example generation is
  numpy-bound); completed batches are emitted strictly in index order so
  training data order stays deterministic.
  """

  def __init__(
      self,
      make_batch: Callable[[int], DataDict],
      num_batches: Optional[int],
      sharding: Optional[jax.sharding.Sharding],
      buffer_size: int = 2,
      start_index: int = 0,
      num_workers: int = 2,
      prebuilt: bool = False,
  ):
    self._make_batch = make_batch
    self._num_batches = num_batches
    self._sharding = sharding
    # prebuilt: make_batch already returns (device batch, host side-channel)
    # with device placement done (the on-device generation path).
    self._prebuilt = prebuilt
    self._buffer_size = max(buffer_size, num_workers)
    self._results: Dict[int, Any] = {}
    self._error: Optional[BaseException] = None
    self._lock = threading.Lock()
    self._ready = threading.Condition(self._lock)
    self._next_to_build = start_index
    self._next_to_emit = start_index
    for _ in range(max(1, num_workers)):
      threading.Thread(target=self._worker, daemon=True).start()

  def _wrap(self, i: int) -> int:
    # Eval iterators repeat after a full pass over their fixed batch count.
    return i if self._num_batches is None else i % self._num_batches

  def _worker(self):
    try:
      while True:
        with self._lock:
          # Backpressure: don't run ahead of the consumer by > buffer_size.
          # Every state change (emit, build-complete, error) notifies the
          # shared condition, so these waits need no polling timeout.
          while (self._error is None and self._next_to_build
                 - self._next_to_emit >= self._buffer_size):
            self._ready.wait()
          if self._error is not None:
            return
          i = self._next_to_build
          self._next_to_build += 1
        if self._prebuilt:
          device_batch, host = self._make_batch(self._wrap(i))
        else:
          batch = self._make_batch(self._wrap(i))
          device_batch, host = split_host_data(batch)
          if self._sharding is not None:
            device_batch = put_global_batch(device_batch, self._sharding)
        with self._lock:
          self._results[i] = (device_batch, host)
          self._ready.notify_all()
    except BaseException as e:  # pylint: disable=broad-except
      with self._lock:
        self._error = e
        self._ready.notify_all()

  def __iter__(self):
    return self

  def __next__(self) -> DataDict:
    with self._lock:
      while self._next_to_emit not in self._results:
        if self._error is not None:
          raise RuntimeError('Data pipeline worker failed') from self._error
        self._ready.wait()
      device_batch, host = self._results.pop(self._next_to_emit)
      self._next_to_emit += 1
      self._ready.notify_all()
    device_batch = dict(device_batch)
    device_batch['_host'] = host
    return device_batch


def _host_strings(mode: types.DataMode, seed: int,
                  indices: np.ndarray) -> DataDict:
  """String side-channel for on-device batches (matches synthetic.py ids)."""
  scene_ids = np.asarray([f'synthetic/{seed}/{i}' for i in indices])
  if mode == types.DataMode.SINGLE_SCENE:
    return {
        'scene_id': scene_ids,
        'vehicle_type': np.asarray(['CAR'] * len(indices)),
    }
  if mode == types.DataMode.PAIR_SCENE_VIEW:
    query_ids = np.asarray([f'synthetic_query/{seed}/{i}' for i in indices])
    return {
        'map/scene_id': scene_ids,
        'map/vehicle_type': np.asarray(['CAR'] * len(indices)),
        'query/scene_id': query_ids,
        'query/vehicle_type': np.asarray(['TREKKER'] * len(indices)),
        'pair_id': np.asarray(
            [f'{m}|{q}' for m, q in zip(scene_ids, query_ids)]),
    }
  if mode == types.DataMode.PAIR_SCENES:
    cars = np.asarray(['CAR'] * len(indices))
    return {
        'scene_i/scene_id': scene_ids,
        'scene_i/vehicle_type': cars,
        'scene_j/scene_id': np.asarray([f'{s}/j' for s in scene_ids]),
        'scene_j/vehicle_type': cars,
    }
  raise NotImplementedError(mode)


def location_seed(location: Optional[str], base_seed: int) -> int:
  """Stable per-location seed so pseudo-cities have disjoint content."""
  if not location:
    return base_seed
  h = 0
  for ch in str(location):
    h = (h * 131 + ord(ch)) % (2**31)
  return (base_seed * 1_000_003 + h) % (2**31)


def get_dataset(
    *,
    batch_size: int,
    eval_batch_size: Optional[int],
    dataset_configs: ml_collections.ConfigDict,
    mesh: Optional[jax.sharding.Mesh] = None,
    shuffle_seed: int = 0,
    start_step: int = 0,
) -> Dataset:
  """Build train/eval iterators over synthetic scenes.

  The batch axis is sharded over the mesh 'data' axis when a mesh is given.
  Multi-host: ``batch_size`` is the *global* batch; each process generates
  only its contiguous block of ``batch_size / process_count`` examples and
  the global array is assembled from the per-process shards by
  ``put_global_batch`` (jax.make_array_from_process_local_data). Tested by
  tests/test_multihost.py with two jax.distributed CPU processes.
  """
  eval_batch_size = eval_batch_size or batch_size
  mode = types.DataMode(dataset_configs.mode or 'pair_scene_view')
  voxel_size = dataset_configs.voxel_size or 0.2

  scene_config = types.SceneConfig(
      num_views=dataset_configs.get('num_views') or 10)
  rasters_config = types.RastersConfig(resolution=voxel_size)
  lidar_config = types.LidarConfig(
      num_rays=dataset_configs.get('num_rays') or 10_000)
  pairing_config = types.PairingConfig()
  build_config = types.ProcessingConfig(
      mode=mode,
      scene_config=scene_config,
      rasters_config=rasters_config,
      lidar_config=lidar_config,
      pairing_config=pairing_config,
  )

  image_hw = tuple(dataset_configs.get('image_size') or (90, 120))
  example_kwargs = dict(
      mode=mode,
      add_images=dataset_configs.add_images,
      add_rasters=dataset_configs.add_rasters,
      add_lidar_rays=dataset_configs.add_lidar_rays,
      num_rays=dataset_configs.get('num_rays'),
  )

  def make_generator(location: Optional[str], seed_salt: int):
    return synthetic.SyntheticSceneGenerator(
        scene_config=scene_config,
        rasters_config=rasters_config,
        lidar_config=lidar_config,
        pairing_config=pairing_config,
        image_hw=image_hw,
        voxel_size=voxel_size,
        seed=location_seed(location, shuffle_seed + seed_salt),
    )

  sharding = None
  if mesh is not None:
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec('data'))

  process_index = jax.process_index()
  num_processes = jax.process_count()
  if batch_size % num_processes or eval_batch_size % num_processes:
    raise ValueError(
        f'Global batch sizes ({batch_size}, {eval_batch_size}) must divide '
        f'evenly over {num_processes} processes.')

  def make_batch(generator, bs, is_training, num_examples, batch_index):
    """Build this process's contiguous block of global batch ``batch_index``."""
    local_bs = bs // num_processes
    start = batch_index * bs + process_index * local_bs
    examples = []
    for k in range(local_bs):
      global_idx = start + k
      if not is_training:
        global_idx = min(global_idx, max(num_examples - 1, 0))
      examples.append(generator.make_example(global_idx, **example_kwargs))
    batch = _stack_examples(examples)
    if not is_training and num_examples is not None:
      mask = (np.arange(start, start + local_bs) < num_examples)
    else:
      mask = np.ones(local_bs, bool)
    batch['batch_mask'] = mask.astype(np.float32)
    return process_batch(batch, mode)

  train_location = dataset_configs.locations.training
  eval_location = dataset_configs.locations.evaluation or train_location

  evaluation_size = int(dataset_configs.evaluation_size or 1024)
  num_eval_batches = -(-evaluation_size // eval_batch_size)

  # On-device generation: the procedural world is evaluated as one jitted
  # XLA program per batch on the accelerator (the host can be a single
  # core — it only dispatches and formats the string side-channel). Host
  # (numpy) generation remains the path for multi-process runs and the
  # CPU test mesh.
  on_device = dataset_configs.get('on_device_generation')
  if on_device is None:
    on_device = jax.default_backend() != 'cpu'
  use_device_gen = bool(on_device)
  if use_device_gen and num_processes > 1 and mesh is None:
    # Multi-process device generation needs the mesh to place each
    # process's block on its own devices before global assembly.
    use_device_gen = False
  # The two generators are distributionally (not bitwise) equal — JAX
  # threefry vs numpy Philox streams — so record which path produced the
  # data (it is part of dataset identity across environments; ADVICE r2).
  generator_kind = 'device-jax' if use_device_gen else 'host-numpy'
  logging.info(
      'Synthetic data generator: %s (backend=%s, processes=%d).',
      generator_kind, jax.default_backend(), jax.process_count())

  if use_device_gen:
    spec = device_synthetic.Spec.from_configs(
        scene_config, rasters_config, image_hw, voxel_size,
        add_images=bool(dataset_configs.add_images),
        add_rasters=bool(dataset_configs.add_rasters),
        add_lidar_rays=bool(dataset_configs.add_lidar_rays),
        num_rays=int(dataset_configs.get('num_rays')
                     or lidar_config.num_rays),
        pair_overlap=(pairing_config.min_overlap, pairing_config.max_overlap),
    )

    # Multi-process: each process generates only its contiguous block of
    # the global batch *on its own devices* (local-mesh sharding), then the
    # per-device pieces are stitched into global arrays zero-copy — the
    # device-generation equivalent of the reference's per-host tf.data
    # sharding (snap/data/loader.py:266). Removes the round-2 single-process
    # gate that forced multi-host runs onto ~3 s/batch host generation.
    gen_sharding = sharding
    if num_processes > 1:
      local_mesh = mesh.local_mesh
      gen_sharding = jax.sharding.NamedSharding(
          local_mesh, jax.sharding.PartitionSpec('data'))

    def assemble_global(batch):
      def put(x):
        global_shape = (x.shape[0] * num_processes, *x.shape[1:])
        arrays = [s.data for s in x.addressable_shards]
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrays)

      return jax.tree_util.tree_map(put, dict(batch))

    def make_device_batch_fn(location, seed_salt):
      seed = location_seed(location, shuffle_seed + seed_salt)
      batcher = device_synthetic.DeviceBatcher(spec, mode, seed, gen_sharding)

      def make(bs, is_training, num_examples, batch_index):
        local_bs = bs // num_processes
        start = batch_index * bs + process_index * local_bs
        indices = np.arange(start, start + local_bs)
        if not is_training and num_examples is not None:
          mask = indices < num_examples
          indices = np.minimum(indices, max(num_examples - 1, 0))
        else:
          mask = np.ones(local_bs, bool)
        batch = batcher(indices, mask)
        if num_processes > 1:
          batch = assemble_global(batch)
        host = _host_strings(mode, seed, indices)
        return batch, host

      return make

    make_train = make_device_batch_fn(train_location, seed_salt=0)
    make_eval = make_device_batch_fn(eval_location, seed_salt=1)
    train_batch_fn = functools.partial(make_train, batch_size, True, None)
    eval_batch_fn = functools.partial(
        make_eval, eval_batch_size, False, evaluation_size)
    iter_kwargs = dict(sharding=None, prebuilt=True)
  else:
    train_gen = make_generator(train_location, seed_salt=0)
    eval_gen = make_generator(eval_location, seed_salt=1)
    train_batch_fn = functools.partial(make_batch, train_gen, batch_size,
                                       True, None)
    eval_batch_fn = functools.partial(
        make_batch, eval_gen, eval_batch_size, False, evaluation_size)
    iter_kwargs = dict(sharding=sharding)

  num_workers = int(dataset_configs.get('num_workers') or 2)
  train_iter = _PrefetchIterator(
      train_batch_fn,
      num_batches=None,
      buffer_size=int(dataset_configs.get('prefetch_buffer_size') or 2),
      start_index=start_step,
      num_workers=num_workers,
      **iter_kwargs,
  )
  eval_iter = _PrefetchIterator(
      eval_batch_fn,
      num_batches=num_eval_batches,
      buffer_size=2,
      num_workers=num_workers,
      **iter_kwargs,
  )

  grid_size_meters = scene_config.grid_size
  grid = grids.Grid3D.from_extent_meters(grid_size_meters, voxel_size)
  training_size = int(dataset_configs.get('training_size_per_builder')
                      or 1_000_000)

  def get_dummy_batch():
    if use_device_gen:
      batch, host = train_batch_fn(0)
      batch = dict(batch)
      batch['_host'] = host
      return batch
    return train_batch_fn(0)

  meta_data = {
      'grid': grid,
      'build_config': build_config,
      'grid_size_meters': grid_size_meters,
      'num_train_examples': training_size,
      'num_eval_examples': evaluation_size,
      'get_dummy_batch_fn': get_dummy_batch,
      'semantic_map_classes': rasters_config.semantic_classes,
      'semantic_classes_gt': rasters_config.gt_semantic_classes,
      'generator_kind': generator_kind,
      # Device-generation Spec (None on the host path): exposes the pure
      # content function make_example(spec, mode, seed, index) so tests can
      # verify global-batch placement example by example.
      'device_spec': spec if use_device_gen else None,
  }
  return Dataset(train_iter, eval_iter, None, meta_data)
