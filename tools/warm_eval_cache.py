"""AOT warm-compile of the eval-scale graphs into the persistent cache.

Zero chip time (probe_compile_hbm.py pattern: lower from abstract shapes
→ the compile runs on the relay helper; the persistent compilation cache
at /tmp/jax_cache then serves bench.py / tools/profile_eval.py warm).
Run while a training chunk owns the chip so the end-of-round eval window
doesn't pay the 10–20 min cold compile.

Usage: python tools/warm_eval_cache.py [subcell(0/1)] ...
Each listed variant (default: 0 and 1) is compiled for both build_map
and localize at bench.EVAL_BATCH with the eval-side lift tiling.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import bench


def main():
  variants = [int(v) for v in sys.argv[1:]] or [0, 1]
  config, model, batch, _ = bench.build(
      bench.EVAL_BATCH, point_tile_eval=bench.POINT_TILE_EVAL)
  abstract_batch = jax.tree_util.tree_map(
      lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
      if not isinstance(x, (str, bytes)) else x, batch)
  rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1)}
  abstract_vars = jax.eval_shape(
      lambda b: model.flax_model.init(rngs, b, train=False), abstract_batch)

  from snap_tpu.models import bev_localizer
  for sub in variants:
    cfg = config.model.copy_and_resolve_references()
    with cfg.unlocked():
      cfg.subcell_refinement = bool(sub)
    m = bev_localizer.BEVLocalizerModel(
        cfg, model.dataset_meta_data, jnp.float32)

    def localize(variables, b):
      pred = m.flax_model.apply(variables, b, train=False,
                                rngs={'sampling': jax.random.PRNGKey(2)})
      return pred['scores_poses'].sum() + pred['map_t_query'].t.sum()

    def build_map(variables, b):
      pred = m.flax_model.apply(
          variables, b['map'], train=False,
          rngs={'sampling': jax.random.PRNGKey(2)},
          method=lambda mm, d, train: mm.bev_mapper(d, train=train))
      return pred['bev_matching'].features.sum()

    for name, fn in (('build_map', build_map), ('localize', localize)):
      t0 = time.monotonic()
      jax.jit(fn).lower(abstract_vars, abstract_batch).compile()
      print(f'subcell={sub} {name}: compiled in {time.monotonic()-t0:.0f}s',
            flush=True)


if __name__ == '__main__':
  main()
