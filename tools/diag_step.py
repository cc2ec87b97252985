"""Diagnose train-step vs data-pipeline time at small scale."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('XLA_PYTHON_CLIENT_MEM_FRACTION', '0.9')
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
import functools
import jax.numpy as jnp
from snap_tpu import models
from snap_tpu.data import loader as data_loader
from snap_tpu.parallel import mesh as mesh_lib
from snap_tpu.train_lib import trainer as trainer_lib
from snap_tpu.train_lib import lr_schedules, optimizers
from snap_tpu.utils.configs import load_config_module

cfg_str = sys.argv[1] if len(sys.argv) > 1 else (
    'snap_tpu/configs/train_localization.py:scale=small,pose_backend=exhaustive')
config = load_config_module(cfg_str)
mesh = mesh_lib.make_mesh(config.get('mesh'))

t0 = time.time()
dataset = data_loader.get_dataset(
    batch_size=config.batch_size, eval_batch_size=config.get('eval_batch_size'),
    dataset_configs=config.data, mesh=mesh, shuffle_seed=0, start_step=0)
print(f'dataset built: {time.time()-t0:.1f}s', flush=True)

t0 = time.time()
batch = next(dataset.train_iter)
print(f'first batch: {time.time()-t0:.2f}s', flush=True)
t0 = time.time()
N = 10
for _ in range(N):
    b2 = next(dataset.train_iter)
dt = (time.time()-t0)/N
print(f'loader (steady): {dt*1000:.0f} ms/batch ({config.batch_size/dt:.2f} ex/s)', flush=True)

dtype = getattr(jnp, config.dtype_str)
model = models.get_model(config.model_name)(config.model, dataset.meta_data, dtype)
rng = jax.random.PRNGKey(0)
params, model_state, _ = trainer_lib.initialize_model(
    model_def=model.flax_model, dummy_input=dataset.meta_data['get_dummy_batch_fn'](),
    rng=rng)
has_model_state = bool(jax.tree_util.tree_leaves(model_state.get('batch_stats', {})))
lr_fn = lr_schedules.get_learning_rate_fn(config)
tx = optimizers.get_optimizer(config, lr_fn, params=params)
repl = mesh_lib.replicated(mesh)
param_shardings = mesh_lib.infer_param_shardings(params, mesh, min_dim=256)
train_state = trainer_lib.TrainState(
    global_step=mesh_lib.put_host_tree(jnp.zeros((), jnp.int32), repl),
    params=mesh_lib.put_host_tree(params, param_shardings),
    opt_state=mesh_lib.put_host_tree(jax.jit(tx.init, backend='cpu')(params), repl),
    model_state=mesh_lib.put_host_tree(model_state, repl),
    rng=mesh_lib.put_host_tree(jax.random.PRNGKey(1), repl),
    tx=tx, dynamic_scale=None)
step_jit = jax.jit(functools.partial(
    trainer_lib.train_step, flax_model=model.flax_model,
    loss_metrics_fn=model.loss_metrics_function, lr_fn=lr_fn,
    has_model_state=has_model_state), donate_argnums=(0,))
batch.pop('_host', None)
t0 = time.time()
train_state, m, l = step_jit(train_state, batch)
jax.block_until_ready(l)
print(f'step compile+1: {time.time()-t0:.1f}s', flush=True)
times = []
for i in range(8):
    t0 = time.time()
    train_state, m, l = step_jit(train_state, dict(batch))
    jax.block_until_ready(l)
    times.append(time.time()-t0)
print(f'train step (fixed batch): {min(times)*1000:.0f} ms min, {sum(times)/len(times)*1000:.0f} ms avg', flush=True)

# 3) generation-only throughput on device
import numpy as _np
gen_iter = dataset.train_iter
t0 = time.time()
for i in range(20):
    bb = next(gen_iter)
jax.block_until_ready({k: v for k, v in bb.items() if k != '_host'})
dt = (time.time()-t0)/20
print(f'device generation (incl dispatch): {dt*1000:.0f} ms/batch', flush=True)
