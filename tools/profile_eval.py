"""Pause-time profiler: eval-scale map + localize op breakdown on TPU."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('XLA_PYTHON_CLIENT_MEM_FRACTION', '0.9')
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import bench

_, model, batch, _ = bench.build(bench.EVAL_BATCH)
rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1)}
variables = jax.jit(lambda b: model.flax_model.init(rngs, b, train=False))(batch)

@jax.jit
def localize(variables, batch):
    pred = model.flax_model.apply(variables, batch, train=False,
                                  rngs={'sampling': jax.random.PRNGKey(2)})
    return pred['scores_poses'].sum() + pred['map_t_query'].t.sum()

@jax.jit
def build_map(variables, batch):
    pred = model.flax_model.apply(
        variables, batch['map'], train=False,
        rngs={'sampling': jax.random.PRNGKey(2)},
        method=lambda m, d, train: m.bev_mapper(d, train=train))
    return pred['bev_matching'].features.sum()

batch = jax.device_put(batch)
float(build_map(variables, batch)); float(localize(variables, batch))

outdir = '/tmp/profile_eval'
jax.profiler.start_trace(outdir)
for _ in range(2):
    float(build_map(variables, batch))
for _ in range(2):
    float(localize(variables, batch))
jax.profiler.stop_trace()
print('trace written to', outdir)
