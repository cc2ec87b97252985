"""Training loop: one jitted SPMD step over a device mesh.

TPU-native replacement for the reference's pmap trainer (snap/trainer.py):

- a single ``jax.jit`` step with donated (state, batch) buffers and
  NamedSharding annotations — batch over the 'data' mesh axis, state
  replicated; XLA SPMD emits the gradient all-reduce over ICI;
- bfloat16 compute with float32 master params by default (no loss scale);
  float16 + non-finite step skipping remains supported as a capability;
- metrics follow the reference convention: per-example vectors, masked by
  ``batch_mask`` and finiteness, reduced to (sum, count) pairs on device and
  accumulated between summaries to avoid per-step transfers;
- orbax checkpointing with keep-last-N, resume with data-seed folding,
  and the pretrained-subtree protocol at init
  (reference: snap/trainer.py:70-120).
"""

from __future__ import annotations

import functools
import json
import pathlib
import time
from typing import Any, Callable, Dict, Optional, Tuple, Type

from absl import logging
import flax
from flax import struct
import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import optax

from snap_tpu.data import loader as data_loader
from snap_tpu.models import base
from snap_tpu.parallel import mesh as mesh_lib
from snap_tpu.train_lib import checkpoints
from snap_tpu.train_lib import lr_schedules
from snap_tpu.train_lib import optimizers

PyTree = Any
AggregatedMetrics = Dict[str, Tuple[jax.Array, jax.Array]]


@struct.dataclass
class TrainState:
  global_step: jax.Array
  params: PyTree
  opt_state: PyTree
  model_state: PyTree
  rng: jax.Array
  tx: optax.GradientTransformation = struct.field(pytree_node=False)
  # fp16 only: dynamic loss scale (bf16 needs none; reference parity with
  # snap/trainer.py:52-54). None when dtype is f32/bf16.
  dynamic_scale: Any = None


def state_to_ckpt(state: TrainState) -> Dict[str, Any]:
  """Serializable view of the state (drops the static optax transform)."""
  ckpt = dict(
      global_step=state.global_step,
      params=state.params,
      opt_state=state.opt_state,
      model_state=state.model_state,
      rng=state.rng,
  )
  if state.dynamic_scale is not None:
    ckpt['dynamic_scale'] = state.dynamic_scale
  return ckpt


def reduce_metrics(metrics: base.MetricsDict, mask: jax.Array
                   ) -> AggregatedMetrics:
  """Mask per-example metrics by batch_mask & finiteness -> (sum, count)."""
  aggregated = {}
  for k, v in metrics.items():
    v = v.astype(jnp.float32)
    metric_mask = mask * jnp.isfinite(v)
    aggregated[k] = (jnp.sum(v * metric_mask), metric_mask.sum())
  return aggregated


def _gather_variables_recursive(m: nn.Module, method_name: str
                                ) -> Dict[str, Any]:
  """Collect pretrained subtrees returned by submodules' hook methods."""
  if hasattr(m, method_name):
    ret = getattr(m, method_name)()
    if ret is not None:
      return ret
  ret: Dict[str, Any] = {}
  for name, child in m._state.children.items():  # pylint: disable=protected-access
    if isinstance(child, str):  # plain parameter
      continue
    child_vars = _gather_variables_recursive(child, method_name)
    for k, var in child_vars.items():
      ret.setdefault(k, {})[name] = var
  return ret


def update_pretrained_variables(
    model_def: nn.Module, variables: PyTree
) -> PyTree:
  """Overwrite init variables with pretrained subtrees from submodules."""
  pretrained = model_def.apply(
      variables, 'load_pretrained_variables',
      method=_gather_variables_recursive)
  pretrained = flax.traverse_util.flatten_dict(flax.core.unfreeze(pretrained))
  if not pretrained:
    return variables

  variables = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))
  keys_unused = pretrained.keys() - variables.keys()
  keys_update = pretrained.keys() & variables.keys()
  if keys_unused:
    logging.info(
        'The following pretrained variables will not be used:\n%s',
        '\n'.join(map('.'.join, sorted(keys_unused))),
    )
    if not keys_update:
      raise ValueError(
          'Could not load any pre-trained weight, all were left unused.')
  logging.info('Updating %d variable(s) from pretrained weights.',
               len(keys_update))
  for k in keys_update:
    variables[k] = jnp.asarray(pretrained[k]).astype(variables[k].dtype)
  return flax.traverse_util.unflatten_dict(variables)


def initialize_model(
    *,
    model_def: nn.Module,
    dummy_input: base.Batch,
    rng: jax.Array,
    backend: Optional[str] = 'cpu',
) -> Tuple[PyTree, PyTree, int]:
  """Init params from a real dummy batch, on CPU by default.

  Reference rationale (snap/trainer.py:123-162): initializing from a real
  batch supports batches carrying arbitrary pytree objects, and CPU-side init
  avoids double device allocation before sharded placement.
  ``backend=None`` initializes on the default (accelerator) backend instead:
  on a 1-core host the CPU compile+execute of a full-scale forward takes
  tens of minutes, while the accelerator does it in seconds — single-chip
  benches and full-scale runs should prefer it.
  """
  dummy_input = jax.device_get(dummy_input)
  dummy_input.pop('_host', None)

  @functools.partial(jax.jit, backend=backend)
  def _initialize_model(rngs, batch):
    variables = model_def.init(rngs, batch, train=False)
    return variables

  rngs = dict(zip(('params', 'sampling'), jax.random.split(rng, 2)))
  try:
    variables = _initialize_model(rngs, dummy_input)
  except RuntimeError as e:
    if backend is None or 'Unknown backend' not in str(e):
      raise
    # Pure-accelerator platform (JAX_PLATFORMS without cpu): init on the
    # default device instead.
    variables = jax.jit(
        lambda r, b: model_def.init(r, b, train=False))(rngs, dummy_input)
  variables = update_pretrained_variables(model_def, variables)
  variables = flax.core.unfreeze(variables)
  init_params = variables.pop('params')
  init_model_state = variables
  num_params = sum(
      np.prod(p.shape) for p in jax.tree_util.tree_leaves(init_params))
  logging.info('Initialized model with %d parameters.', num_params)
  return init_params, init_model_state, int(num_params)


def train_step(
    train_state: TrainState,
    batch: base.Batch,
    *,
    flax_model: nn.Module,
    loss_metrics_fn: base.LossMetricsFn,
    lr_fn: lr_schedules.LrFn,
    has_model_state: bool,
) -> Tuple[TrainState, AggregatedMetrics, Dict[str, jax.Array]]:
  """One SPMD training step (jitted over the mesh by the caller)."""
  new_rng, rng = jax.random.split(train_state.rng)
  sampling_rng = jax.random.fold_in(rng, train_state.global_step)

  def training_loss_fn(params):
    variables = {'params': params, **train_state.model_state}
    if has_model_state:
      pred, new_model_state = flax_model.apply(
          variables, batch, mutable=['batch_stats'], train=True,
          rngs={'sampling': sampling_rng})
    else:
      pred = flax_model.apply(
          variables, batch, train=True, rngs={'sampling': sampling_rng})
      new_model_state = train_state.model_state
    losses, metrics = loss_metrics_fn(pred, batch, params)
    loss = losses['total'].mean(where=batch['batch_mask'] > 0)
    return loss, (new_model_state, losses, metrics)

  logs = {}
  dynamic_scale = train_state.dynamic_scale
  if dynamic_scale is not None:
    # fp16: scale the loss, unscale the grads, adjust the scale each step.
    grad_fn = dynamic_scale.value_and_grad(training_loss_fn, has_aux=True)
    dynamic_scale, is_fin_scale, (_, aux), grad = grad_fn(train_state.params)
    new_model_state, losses, metrics = aux
    logs['loss_scale'] = dynamic_scale.scale
  else:
    grad_fn = jax.grad(training_loss_fn, has_aux=True)
    grad, (new_model_state, losses, metrics) = grad_fn(train_state.params)
    is_fin_scale = jnp.asarray(True)

  updates, new_opt_state = train_state.tx.update(
      grad, train_state.opt_state, train_state.params)
  new_params = optax.apply_updates(train_state.params, updates)

  logs['l2_grads'] = optax.global_norm(grad)
  logs['l2_updates'] = optax.global_norm(updates)
  logs['learning_rate'] = lr_fn(train_state.global_step)

  # Non-finite guard: skip the update (keep old params/opt state) if any
  # gradient leaf is non-finite (reference: snap/trainer.py:260-277).
  is_fin = is_fin_scale & jnp.all(jnp.stack([
      jnp.isfinite(g).all() for g in jax.tree_util.tree_leaves(grad)]))
  new_opt_state = jax.tree_util.tree_map(
      functools.partial(jnp.where, is_fin), new_opt_state,
      train_state.opt_state)
  new_params = jax.tree_util.tree_map(
      functools.partial(jnp.where, is_fin), new_params, train_state.params)
  logs['is_finite'] = is_fin
  logs['l2_params'] = optax.global_norm(
      jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), new_params))

  for k, v in losses.items():
    metrics[f'loss/{k}'] = v
  metrics = reduce_metrics(metrics, batch['batch_mask'])

  new_train_state = train_state.replace(
      global_step=train_state.global_step + 1,
      opt_state=new_opt_state,
      params=new_params,
      model_state=new_model_state,
      rng=new_rng,
      dynamic_scale=dynamic_scale,
  )
  return new_train_state, metrics, logs


def eval_step(
    train_state: TrainState,
    batch: base.Batch,
    rng: jax.Array,
    *,
    flax_model: nn.Module,
    loss_metrics_fn: base.LossMetricsFn,
) -> AggregatedMetrics:
  variables = {'params': train_state.params, **train_state.model_state}
  pred = flax_model.apply(
      variables, batch, train=False, mutable=False,
      rngs={'sampling': rng})
  losses, metrics = loss_metrics_fn(pred, batch, train_state.params)
  for k, v in losses.items():
    metrics[f'loss/{k}'] = v
  return reduce_metrics(metrics, batch['batch_mask'])


def _summarize(accumulated: list[AggregatedMetrics]) -> Dict[str, float]:
  """Host-side: (sum, count) pairs across steps -> means."""
  out: Dict[str, float] = {}
  if not accumulated:
    return out
  keys = accumulated[0].keys()
  for k in keys:
    total = float(np.sum([np.asarray(m[k][0]) for m in accumulated]))
    count = float(np.sum([np.asarray(m[k][1]) for m in accumulated]))
    out[k] = total / max(count, 1.0)
  return out


class Chrono:
  """Walltime accounting with pause/resume around non-step work.

  ``first_step`` anchors resumed runs: steps/sec divides the steps taken in
  *this* run by this run's active walltime, so a restart from step 100k does
  not report inflated throughput.
  """

  def __init__(self, first_step: int = 0):
    self._start = time.monotonic()
    self._paused_at: Optional[float] = None
    self._paused_total = 0.0
    self.first_step = first_step
    self.steps = first_step

  def pause(self):
    if self._paused_at is None:
      self._paused_at = time.monotonic()

  def resume(self):
    if self._paused_at is not None:
      self._paused_total += time.monotonic() - self._paused_at
      self._paused_at = None

  def active_walltime(self) -> float:
    """Active (unpaused) seconds elapsed in this run."""
    return time.monotonic() - self._start - self._paused_total

  def tick(self, steps: int) -> float:
    """Returns steps/sec of active (unpaused) time in this run."""
    self.steps = steps
    return (steps - self.first_step) / max(self.active_walltime(), 1e-9)

  def exclude_elapsed(self, step: int):
    """Drop all active time so far (e.g. the first-step XLA compile) and
    re-anchor rates at ``step``, so steps/sec and ETA report steady-state
    compute rate instead of amortizing a multi-minute compile."""
    self._paused_total += self.active_walltime()
    self.first_step = step


def train(
    *,
    mesh: Optional[jax.sharding.Mesh] = None,
    **kwargs,
) -> Tuple[TrainState, Dict[str, float], Dict[str, float]]:
  """Main training loop. Returns (state, train_summary, eval_summary)."""
  if mesh is None:
    mesh = mesh_lib.make_mesh(kwargs['config'].get('mesh'))
  return _train(mesh=mesh, **kwargs)


def _resolve_stop_step(config: ml_collections.ConfigDict,
                       stop_at_step: Optional[int]) -> int:
  """Early-stop boundary for supervised chunked runs.

  ``stop_at_step`` ends the loop (with a final checkpoint/summary/eval)
  before ``num_training_steps`` WITHOUT touching the lr schedule, which is
  sized by ``num_training_steps`` — overriding the step count itself would
  silently reshape the cosine decay (train_localization.py:119-121).
  """
  total = int(config.num_training_steps)
  stop = stop_at_step or config.get('stop_at_step') or total
  return min(total, int(stop))


def _under_mesh(fn: Callable, mesh: jax.sharding.Mesh) -> Callable:
  """Trace/execute ``fn`` with ``mesh`` as JAX's ambient mesh.

  In-model activation sharding constraints (``mesh_lib.constrain``) bind to
  the ambient mesh; with model=1 they compile away. Scoped per call because
  a global mesh context forbids the host-side (backend='cpu') init jits.
  """

  @functools.wraps(fn)
  def wrapped(*args, **kw):
    with jax.set_mesh(mesh):
      return fn(*args, **kw)

  return wrapped


def _train(
    *,
    rng: jax.Array,
    config: ml_collections.ConfigDict,
    model_cls: Type[base.BaseModel],
    dataset: data_loader.Dataset,
    workdir: str,
    writer: Optional[Any] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    stop_at_step: Optional[int] = None,
) -> Tuple[TrainState, Dict[str, float], Dict[str, float]]:
  lead_host = jax.process_index() == 0
  dtype = getattr(jnp, config.dtype_str)

  model = model_cls(config.model, dataset.meta_data, dtype)

  rng, init_rng = jax.random.split(rng)
  params, model_state, num_params = initialize_model(
      model_def=model.flax_model,
      dummy_input=dataset.meta_data['get_dummy_batch_fn'](),
      rng=init_rng,
      backend=(None if config.get('init_backend', 'cpu') == 'device'
               else config.get('init_backend', 'cpu')),
  )
  has_model_state = bool(
      jax.tree_util.tree_leaves(model_state.get('batch_stats', {})))

  lr_fn = lr_schedules.get_learning_rate_fn(config)
  tx = optimizers.get_optimizer(config, lr_fn, params=params)

  # fp16 uses a dynamic loss scale; bf16/f32 need none (reference:
  # snap/trainer.py:388-394).
  dynamic_scale = None
  if dtype == jnp.float16:
    from flax.training import dynamic_scale as dynamic_scale_lib
    dynamic_scale = dynamic_scale_lib.DynamicScale(minimum_scale=256.0)

  rng, train_rng, eval_rng = jax.random.split(rng, 3)
  # Optimizer state init prefers the host CPU (no device alloc before
  # sharded placement), but a pure-accelerator platform (JAX_PLATFORMS
  # without cpu) has no such backend — fall back to the default device.
  try:
    opt_state = jax.jit(tx.init, backend='cpu')(params)
  except RuntimeError as e:
    # Only a missing 'cpu' backend falls through to the accelerator; any
    # other RuntimeError (OOM, XLA failure) must surface.
    if 'Unknown backend' not in str(e):
      raise
    opt_state = jax.jit(tx.init)(params)
  host_state = dict(
      global_step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=opt_state,
      model_state=model_state,
      rng=train_rng,
  )
  if dynamic_scale is not None:
    host_state['dynamic_scale'] = dynamic_scale
  start_step = 0
  ckpt_step = checkpoints.latest_step(workdir) if config.checkpoint else None

  # Shard params over the mesh (TP where rules apply, else replicated). The
  # optimizer state starts replicated; XLA propagates shardings through the
  # first donated step and they remain stable afterwards.
  repl = mesh_lib.replicated(mesh)
  param_shardings = mesh_lib.infer_param_shardings(
      params, mesh, min_dim=config.get('tp_min_dim') or 256)
  state_shardings = {
      k: (param_shardings if k == 'params'
          else jax.tree_util.tree_map(lambda _: repl, v))
      for k, v in host_state.items()
  }
  if ckpt_step is not None:
    # Resume: restore straight into the mesh placement. The abstract state
    # carries shapes/dtypes/shardings only; the init arrays are dropped
    # FIRST, so peak HBM is one state copy (init-then-restore-then-put held
    # three, which OOMed the full-scale per-chip-batch-2 resume).
    abstract = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.result_type(x), sharding=s),
        host_state, state_shardings)
    del host_state, params, opt_state, model_state
    placed, start_step = checkpoints.restore_checkpoint_placed(
        workdir, abstract, ckpt_step)
  else:
    placed = {
        k: mesh_lib.put_host_tree(v, state_shardings[k])
        for k, v in host_state.items()
    }
    del host_state, params, opt_state, model_state
  train_state = TrainState(
      tx=tx, dynamic_scale=placed.pop('dynamic_scale', None), **placed)
  del placed

  train_step_jit = _under_mesh(jax.jit(
      functools.partial(
          train_step,
          flax_model=model.flax_model,
          loss_metrics_fn=model.loss_metrics_function,
          lr_fn=lr_fn,
          has_model_state=has_model_state,
      ),
      donate_argnums=(0, 1),
  ), mesh)
  eval_step_jit = _under_mesh(jax.jit(
      functools.partial(
          eval_step,
          flax_model=model.flax_model,
          loss_metrics_fn=model.loss_metrics_function,
      ),
      donate_argnums=(1,),
  ), mesh)

  total_steps = config.num_training_steps
  stop_step = _resolve_stop_step(config, stop_at_step)
  log_eval_steps = config.get('log_eval_steps') or 1000
  checkpoint_steps = config.get('checkpoint_steps') or log_eval_steps
  log_summary_steps = config.get('log_summary_steps') or log_eval_steps
  eval_batch_size = config.get('eval_batch_size') or config.batch_size
  total_eval_steps = int(
      np.ceil(dataset.meta_data['num_eval_examples'] / eval_batch_size))
  steps_per_eval = config.get('steps_per_eval') or total_eval_steps

  train_summary: Dict[str, float] = {}
  eval_summary: Dict[str, float] = {}
  chrono = Chrono(first_step=start_step)

  if lead_host and writer is not None and start_step == 0:
    writer.write_scalars(1, {'num_trainable_params': num_params})

  # xprof: trace a few steady-state steps once after (re)start.
  num_profile_steps = 5
  profile_start = -1
  if config.get('xprof', True) and (
      start_step + 3 + num_profile_steps <= stop_step):
    profile_start = start_step + 3

  # Metrics accumulate ON DEVICE between summaries (reference:
  # snap/trainer.py:524-533): one tiny jitted add per step, one small
  # device_get per summary. Fetching per-step metric scalars would pay the
  # host<->device round-trip for every buffer — ruinous on a remote tunnel.
  log_mean_keys = ('l2_grads', 'l2_updates', 'l2_params', 'learning_rate')

  @functools.partial(jax.jit, donate_argnums=(0,))
  def _accumulate(acc, metrics, logs):
    finite = jnp.asarray(logs.get('is_finite', True), jnp.float32)
    return {
        'metrics': jax.tree_util.tree_map(jnp.add, acc['metrics'], metrics),
        'logs': {k: acc['logs'][k] + finite * logs[k] for k in acc['logs']},
        'n_finite': acc['n_finite'] + finite,
    }

  def _zero_acc(metrics, logs):
    return {
        'metrics': jax.tree_util.tree_map(
            lambda x: jnp.zeros((), jnp.float32), metrics),
        'logs': {k: jnp.zeros((), jnp.float32)
                 for k in log_mean_keys if k in logs},
        'n_finite': jnp.zeros((), jnp.float32),
    }

  acc = None
  logging.info('Starting training loop at step %d.', start_step + 1)
  for step in range(start_step + 1, stop_step + 1):
    if lead_host and step == profile_start:
      jax.profiler.start_trace(workdir)
    with jax.profiler.StepTraceAnnotation('train', step_num=step):
      batch = next(dataset.train_iter)
      batch.pop('_host', None)
      train_state, metrics, logs = train_step_jit(train_state, batch)
      if acc is None:
        acc = _zero_acc(metrics, logs)
      acc = _accumulate(acc, metrics, logs)
    if step == start_step + 1:
      # Make compile time visible: the first step blocks on compilation.
      jax.block_until_ready(logs)
      logging.info('First step done (compile included): %.1fs elapsed.',
                   chrono.active_walltime())
      # Steady-state rates: don't amortize the compile into steps/sec/ETA.
      chrono.exclude_elapsed(step)
    if lead_host and profile_start > 0 and step == (
        profile_start + num_profile_steps):
      jax.block_until_ready(train_state.params)
      jax.profiler.stop_trace()

    if (step % log_summary_steps == 0) or (step == stop_step):
      # Drain the dispatch queue before stopping the clock: steps are
      # dispatched asynchronously, so queued device work must count as
      # active time or steps/sec reports the dispatch rate, not compute.
      jax.block_until_ready(logs)
      chrono.pause()
      steps_per_sec = chrono.tick(step)
      acc_host = jax.device_get(acc)
      summary = {
          k: float(s) / max(float(c), 1.0)
          for k, (s, c) in acc_host['metrics'].items()
      }
      # All-skipped window: report NaN (a visible gap in TB), not a fake 0
      # learning rate / grad norm that reads as an optimizer bug.
      n_finite = float(acc_host['n_finite'])
      for k, v in acc_host['logs'].items():
        summary[k] = float(v) / n_finite if n_finite else float('nan')
      summary['steps_per_sec'] = steps_per_sec
      train_summary = summary
      if lead_host and writer is not None:
        writer.write_scalars(
            step, {f'train/{k}': v for k, v in summary.items()})
      logging.info('[%d] %s', step, {k: round(v, 5)
                                     for k, v in summary.items()})
      if lead_host:
        # Work-unit progress note (reference: CLU ReportProgress + platform
        # notes, snap/trainer.py:495-504): percent done + ETA, both logged
        # and dropped as workdir/progress.json for external monitors.
        eta = (total_steps - step) / max(steps_per_sec, 1e-9)
        logging.info('Progress: %.1f%% (step %d/%d), %.2f steps/s, ETA %dm.',
                     100 * step / total_steps, step, total_steps,
                     steps_per_sec, eta / 60)
        try:
          (pathlib.Path(workdir) / 'progress.json').write_text(json.dumps(
              dict(step=step, total_steps=total_steps,
                   percent=round(100 * step / total_steps, 2),
                   steps_per_sec=round(steps_per_sec, 4),
                   eta_seconds=round(eta, 1))))
        except OSError as e:
          logging.warning('Could not write progress note: %s', e)
      acc = None
      chrono.resume()

    if (step % log_eval_steps == 0) or (step == stop_step):
      chrono.pause()
      eval_metrics = []
      for i in range(steps_per_eval):
        eval_batch = next(dataset.valid_iter)
        eval_batch.pop('_host', None)
        e_metrics = eval_step_jit(
            train_state, eval_batch, jax.random.fold_in(eval_rng, i))
        eval_metrics.append(jax.device_get(e_metrics))
      eval_summary = _summarize(eval_metrics)
      if lead_host and writer is not None:
        writer.write_scalars(
            step, {f'eval/{k}': v for k, v in eval_summary.items()})
      logging.info('[%d eval] %s', step, {k: round(v, 5)
                                          for k, v in eval_summary.items()})
      chrono.resume()

    if config.checkpoint and (
        (step % checkpoint_steps == 0) or (step == stop_step)):
      chrono.pause()
      # Collective on every process: orbax's CheckpointManager construction
      # and save are process-synchronized (sync_global_processes), so a
      # lead-host-only save deadlocks multi-process runs. Saving the global
      # device arrays lets each process write its addressable shards (and
      # works for TP-sharded params, which a host device_get could not
      # gather on any single process).
      checkpoints.save_checkpoint(
          workdir, state_to_ckpt(train_state), step,
          max_to_keep=config.get('max_checkpoints_to_keep') or 10)
      chrono.resume()

  if jax.process_count() > 1:
    # Wait for all hosts before exiting (reference: snap/trainer.py:604).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('end_of_training')
  return train_state, train_summary, eval_summary
