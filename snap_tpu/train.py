"""Training entry point: ``python -m snap_tpu.train --config=<cfg.py>[:args]
--workdir=<dir>``.

Replaces the reference's Scenic app runner (snap/train.py): loads a config
module, saves ``workdir/config.yaml``, folds the resume step into the data
seed so restored runs see a fresh data order (reference:
snap/train.py:50-67), builds the mesh, dataset, and model, and hands off to
the trainer.
"""

from __future__ import annotations

import os

from absl import app
from absl import flags
from absl import logging
import jax

from snap_tpu.utils.configs import load_config_module as load_config

# Use most of the HBM; kernels here are large and static.
os.environ.setdefault('XLA_PYTHON_CLIENT_MEM_FRACTION', '0.9')

# The axon sitecustomize force-sets jax_platforms='axon,cpu' AFTER env vars
# are read, silently sending "CPU" runs to the remote TPU tunnel; restore
# the user's explicit JAX_PLATFORMS choice (tests/conftest.py does the same).
if (_platforms := os.environ.get('JAX_PLATFORMS')):
  jax.config.update('jax_platforms', _platforms)

# Persistent compilation cache: restarts and resumed runs skip the multi-
# minute XLA compile of the fused train step.
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                 '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)

FLAGS = flags.FLAGS
flags.DEFINE_string('config', None, 'Path to config file, optionally with '
                    '":<args>" suffix (e.g. cfg.py:image_encoder=R50).')
flags.DEFINE_string('workdir', None, 'Work/checkpoint directory.')
flags.DEFINE_integer(
    'stop_at_step', None,
    'Stop (with a final checkpoint/summary) at this step, before '
    'num_training_steps, without altering the lr schedule. Lets a '
    'supervisor train in resumable chunks on a shared chip.')
flags.mark_flag_as_required('config')
flags.mark_flag_as_required('workdir')


def main(argv):
  del argv
  from snap_tpu import models
  from snap_tpu.data import loader as data_loader
  from snap_tpu.parallel import mesh as mesh_lib
  from snap_tpu.train_lib import checkpoints
  from snap_tpu.train_lib import trainer
  from snap_tpu.utils import configs as config_utils

  config = load_config(FLAGS.config)
  workdir = FLAGS.workdir
  config_utils.config_save(workdir, config)

  rng = jax.random.PRNGKey(config.rng_seed)
  data_rng, rng = jax.random.split(rng)
  shuffle_seed = config.shuffle_seed or 0

  if config.checkpoint:
    # Fold the resume step into the data seed: restored runs get a new
    # example order instead of replaying the beginning of the stream.
    step = checkpoints.latest_step(workdir)
    if step:
      logging.info('Folding global_step %s into dataset seed.', step)
      data_rng = jax.random.fold_in(data_rng, step)
      shuffle_seed = int(
          jax.random.fold_in(jax.random.PRNGKey(shuffle_seed), step).sum())

  mesh = mesh_lib.make_mesh(config.get('mesh'))
  logging.info('Mesh: %s', mesh)

  dataset = data_loader.get_dataset(
      batch_size=config.batch_size,
      eval_batch_size=config.get('eval_batch_size'),
      dataset_configs=config.data,
      mesh=mesh,
      shuffle_seed=shuffle_seed,
      start_step=checkpoints.latest_step(workdir) or 0,
  )
  if (gen_kind := dataset.meta_data.get('generator_kind')) is not None:
    # Data identity depends on the generator path (device-jax vs host-numpy
    # streams are only distributionally equal); record it in the run config.
    with config.unlocked():
      config.data_generator_kind = gen_kind
    config_utils.config_save(workdir, config)

  writer = None
  try:
    from clu import metric_writers
    writer = metric_writers.create_default_writer(
        workdir, just_logging=jax.process_index() > 0)
  except ImportError:
    logging.warning('clu not available; metrics go to logs only.')

  model_cls = models.get_model(config.model_name)
  trainer.train(
      rng=rng,
      config=config,
      model_cls=model_cls,
      dataset=dataset,
      workdir=workdir,
      writer=writer,
      mesh=mesh,
      stop_at_step=FLAGS.stop_at_step,
  )


if __name__ == '__main__':
  app.run(main)
