"""Evaluation entry point: ``python -m snap_tpu.evaluate
--config=snap_tpu/configs/eval_localization.py --config.workdir=<dir>``.

Thin wrapper over the evaluator (reference: snap/evaluate.py).
"""

from __future__ import annotations

import os

from absl import app
from absl import flags
import jax

# The axon sitecustomize force-sets jax_platforms='axon,cpu' AFTER env vars
# are read; restore the user's explicit JAX_PLATFORMS choice.
if (_platforms := os.environ.get('JAX_PLATFORMS')):
  jax.config.update('jax_platforms', _platforms)

from snap_tpu import evaluator
from snap_tpu.utils.configs import load_config_module as load_config

FLAGS = flags.FLAGS
flags.DEFINE_string('config', None, 'Path to the eval config file.')
flags.DEFINE_string('workdir', None, 'Experiment workdir to evaluate.')
flags.DEFINE_string('split', None, 'Override the city split.')
flags.DEFINE_integer(
    'checkpoint_step', None,
    'Evaluate this checkpoint step (default: latest in the workdir).')
flags.mark_flag_as_required('config')


def main(argv):
  del argv
  config = load_config(FLAGS.config)
  if FLAGS.workdir:
    config.workdir = FLAGS.workdir
  if FLAGS.split:
    config.data.split = FLAGS.split
  if FLAGS.checkpoint_step is not None:
    config.checkpoint_step = FLAGS.checkpoint_step
  if config.workdir is None:
    raise ValueError('--workdir (or config.workdir) is required.')
  evaluator.run(config)


if __name__ == '__main__':
  app.run(main)
