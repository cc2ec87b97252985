"""Multi-process data/train path: 2 jax.distributed CPU processes.

Validates the global-batch assembly the reference gets from per-host tf.data
sharding (snap/data/loader.py:266): each process generates only its block of
the global batch, ``put_global_batch`` assembles global arrays, and a sharded
train step consumes them (loss finite and identical across processes).
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=f'localhost:{port}', num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 4 and jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import helpers
from snap_tpu.data import loader as data_loader
from snap_tpu.models import bev_localizer
from snap_tpu.parallel import mesh as mesh_lib
from snap_tpu.train_lib import trainer, lr_schedules, optimizers
from snap_tpu.configs import defaults
import functools
from ml_collections import config_dict

mesh = mesh_lib.make_mesh(config_dict.ConfigDict(dict(data=-1, model=1)))
GLOBAL_BATCH = 4
ds = data_loader.get_dataset(
    batch_size=GLOBAL_BATCH, eval_batch_size=GLOBAL_BATCH,
    dataset_configs=helpers.tiny_dataset_config(num_workers=1),
    mesh=mesh)

batch = next(ds.train_iter)
batch.pop('_host', None)
# Each process contributed 2 examples; the assembled arrays are global.
assert batch['map']['images'].shape[0] == GLOBAL_BATCH
# Every process sees the same global mean (the array is truly global).
img_mean = float(jnp.mean(batch['map']['images']))

config = defaults.base()
config.model_name = 'bev_localizer'
config.model = helpers.tiny_localizer()
config.num_training_steps = 1
config.lr_configs.base_learning_rate = 1e-4
config.batch_size = GLOBAL_BATCH
model = bev_localizer.BEVLocalizerModel(
    config.model, ds.meta_data, jnp.float32)

rng = jax.random.PRNGKey(0)
params, model_state, _ = trainer.initialize_model(
    model_def=model.flax_model,
    dummy_input=ds.meta_data['get_dummy_batch_fn'](), rng=rng)
lr_fn = lr_schedules.get_learning_rate_fn(config)
tx = optimizers.get_optimizer(config, lr_fn, params=params)
repl = mesh_lib.replicated(mesh)
state = trainer.TrainState(
    global_step=mesh_lib.put_host_tree(jnp.zeros((), jnp.int32), repl),
    params=mesh_lib.put_host_tree(params, repl),
    opt_state=mesh_lib.put_host_tree(
        jax.jit(tx.init, backend='cpu')(params), repl),
    model_state=mesh_lib.put_host_tree(model_state, repl),
    rng=mesh_lib.put_host_tree(jax.random.PRNGKey(1), repl),
    tx=tx,
)
step_fn = jax.jit(functools.partial(
    trainer.train_step, flax_model=model.flax_model,
    loss_metrics_fn=model.loss_metrics_function, lr_fn=lr_fn,
    has_model_state=bool(jax.tree_util.tree_leaves(
        model_state.get('batch_stats', {})))),
    donate_argnums=(0, 1))
state, metrics, logs = step_fn(state, batch)
s, c = metrics['loss/total']
loss = float(jax.device_get(s)) / float(jax.device_get(c))
assert np.isfinite(loss), loss
assert int(jax.device_get(c)) == GLOBAL_BATCH

# Multi-process ON-DEVICE generation: each process generates its block on
# its own devices; the assembled global array must place example i at
# global index i (make_example is a pure function of (spec, seed, index)).
from jax.experimental import multihost_utils
from snap_tpu.data import device_synthetic, types as data_types
cfg2 = helpers.tiny_dataset_config(num_workers=1)
cfg2.on_device_generation = True
ds2 = data_loader.get_dataset(
    batch_size=GLOBAL_BATCH, eval_batch_size=GLOBAL_BATCH,
    dataset_configs=cfg2, mesh=mesh)
assert ds2.meta_data['generator_kind'] == 'device-jax'
b2 = next(ds2.train_iter)
b2.pop('_host', None)
assert b2['overlap'].shape[0] == GLOBAL_BATCH
ov_global = np.asarray(
    multihost_utils.process_allgather(b2['overlap'], tiled=True))
spec = ds2.meta_data['device_spec']
seed = data_loader.location_seed(cfg2.locations.training, 0)
ref_fn = jax.jit(lambda i: device_synthetic.make_example(
    spec, data_types.DataMode.PAIR_SCENE_VIEW, seed, i)['overlap'])
expected = [float(ref_fn(jnp.asarray(i))) for i in range(GLOBAL_BATCH)]
np.testing.assert_allclose(ov_global, expected, rtol=1e-5)

# Distributed checkpoint roundtrip, the trainer's flow: save is collective
# (every process calls it with the global device arrays — orbax syncs
# processes inside CheckpointManager; a lead-host-only save deadlocks),
# then both processes restore straight into the distributed placement via
# restore_checkpoint_placed (the trainer's resume path) and take a second
# step from the restored state.
from snap_tpu.train_lib import checkpoints
ckptdir = sys.argv[3]
ckpt = trainer.state_to_ckpt(state)
checkpoints.save_checkpoint(ckptdir, ckpt, 1)
abstract = jax.tree_util.tree_map(
    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
    ckpt)
restored, rstep = checkpoints.restore_checkpoint_placed(ckptdir, abstract)
assert rstep == 1, rstep
for a, b in zip(jax.tree_util.tree_leaves(ckpt),
                jax.tree_util.tree_leaves(restored)):
    assert a.sharding == b.sharding, (a.sharding, b.sharding)
state2 = trainer.TrainState(tx=tx, **restored)
batch2 = next(ds.train_iter)
batch2.pop('_host', None)
state2, m2, _ = step_fn(state2, batch2)
s2, c2 = m2['loss/total']
loss2 = float(jax.device_get(s2)) / float(jax.device_get(c2))
assert np.isfinite(loss2), loss2
assert int(jax.device_get(state2.global_step)) == 2

print(f'RESULT pid={pid} loss={loss:.6f} img_mean={img_mean:.6f} '
      f'devgen_ok=1 resume_loss={loss2:.6f}', flush=True)
"""


@pytest.mark.slow
def test_two_process_cpu_training(tmp_path: pathlib.Path):
  with socket.socket() as s:
    s.bind(('localhost', 0))
    port = s.getsockname()[1]

  script = tmp_path / 'worker.py'
  script.write_text(_WORKER)
  env = dict(os.environ)
  env.pop('JAX_PLATFORMS', None)
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
  env['JAX_NUM_CPU_DEVICES'] = '2'
  repo = str(pathlib.Path(__file__).resolve().parents[1])
  env['PYTHONPATH'] = os.pathsep.join(
      [repo, str(pathlib.Path(__file__).parent),
       env.get('PYTHONPATH', '')]).rstrip(os.pathsep)

  procs = [
      subprocess.Popen(
          [sys.executable, str(script), str(port), str(pid),
           str(tmp_path / 'ckpt')],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          env=env, cwd=repo)
      for pid in range(2)
  ]
  outputs = []
  for p in procs:
    out, _ = p.communicate(timeout=900)
    outputs.append(out)
  for pid, (p, out) in enumerate(zip(procs, outputs)):
    assert p.returncode == 0, f'process {pid} failed:\n{out[-4000:]}'
  results = sorted(
      line for out in outputs for line in out.splitlines()
      if line.startswith('RESULT'))
  assert len(results) == 2, outputs
  # Same global loss and same global batch content on both processes.
  assert results[0].split('pid=0')[1] == results[1].split('pid=1')[1], results
