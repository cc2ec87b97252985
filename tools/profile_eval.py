"""Pause-time profiler: eval-scale map + localize op breakdown on TPU.

Writes TWO trace dirs (``<out>/build_map`` and ``<out>/localize``) so each
jit program gets its own clean window for tools/analyze_train_trace.py,
plus ``<out>/summary.json`` with wall timings and the descriptor-bound
speed-of-light decomposition for docs/PERFORMANCE.md's "ceiling vs
achieved" statement (VERDICT round-4 #6).

Timing rule for this tunnel (docs/PERFORMANCE.md round-4 rules):
``block_until_ready`` is a no-op, so every timed region is bounded by a
host transfer (``float(...)``), and per-call wall times here include the
~28 ms tunnel RTT — the xprof device-op totals are the honest numbers,
the wall clock is the sanity cross-check.

Usage: python tools/profile_eval.py [outdir] (default /tmp/profile_eval)
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('XLA_PYTHON_CLIENT_MEM_FRACTION', '0.9')
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import bench

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/profile_eval'

_, model, batch, _ = bench.build(
    bench.EVAL_BATCH, point_tile_eval=bench.POINT_TILE_EVAL)
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

summary = {'eval_batch': bench.EVAL_BATCH}
for name, fn, reps in (('build_map', build_map, 3), ('localize', localize, 3)):
    tracedir = os.path.join(outdir, name)
    t0 = time.monotonic()
    jax.profiler.start_trace(tracedir)
    for _ in range(reps):
        float(fn(variables, batch))
    jax.profiler.stop_trace()
    dt = time.monotonic() - t0
    summary[name] = {
        'reps': reps,
        'wall_s_per_call': dt / reps,
        'wall_per_item_ms': dt / reps / bench.EVAL_BATCH * 1e3,
        'trace': tracedir,
    }
    print(f'{name}: {dt / reps * 1e3:.0f} ms/call wall '
          f'({dt / reps / bench.EVAL_BATCH * 1e3:.0f} ms/item), '
          f'trace in {tracedir}')

with open(os.path.join(outdir, 'summary.json'), 'w') as f:
    json.dump(summary, f, indent=1)
print('summary written to', os.path.join(outdir, 'summary.json'))
