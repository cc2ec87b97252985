"""Microbenchmark: alternatives for the lift-gather backward scatter.

The round-3 trace (tools/analyze_train_trace.py on the full-scale step)
shows ~543 ms/step in the custom-VJP backward's scatter-adds
(`ops/view_scan.py` bwd: 4 taps x [B,N,D] rows into [B,RW,D]) plus
~120 ms in the template-sampling backward — together ~24% of the 2.73 s
step, while the *forward* gathers of the same volume cost ~80 ms. At HBM
speed-of-light the scatter would be ~4 ms: TPU scatter with duplicate
indices serializes read-modify-write.

Candidates measured at the real shape (B=2, N=288000/tile, RW=56120,
D=160):
  current   vmapped .at[].add, f32 accumulator (the shipped backward)
  bf16      same, bf16 accumulator (halves traffic; grad precision risk)
  sorted    sort contributions by target row, then .at[].add with
            indices_are_sorted=True + unique_indices=False
  segsum    sort + permute + jnp.cumsum + boundary-difference (no scatter
            at all: cumsum rows, read row at each segment end)
  onehot    [N -> RW] one-hot matmul on the MXU (exact, dense): traffic
            N*RW bf16 one-hot is huge, but the MXU is idle in this phase

Usage: python tools/bench_scatter.py [--quick] [--sync] [--modes=a,b]
  --sync   block every iteration (trustworthy sub-10ms timings on the
           remote tunnel; see timeit())
  --modes  comma-separated subset to run (errors are then relative to the
           first mode run)
Prints one JSON line per candidate: {name, ms, max_abs_err vs current}.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('XLA_PYTHON_CLIENT_MEM_FRACTION', '0.9')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

B, N, RW, D = 2, 288_000, 56_120, 160
TAPS = 4
ITERS = 10


def make_inputs(key):
  k1, k2 = jax.random.split(key)
  # Realistic duplicate density: projections cluster; ids in [0, RW).
  ids = jax.random.randint(k1, (B, TAPS * N), 0, RW, jnp.int32)
  vals = jax.random.normal(k2, (B, TAPS * N, D), jnp.bfloat16)
  return ids, vals


@jax.jit
def scatter_current(ids, vals):
  acc = jnp.zeros((B, RW, D), jnp.float32)
  return jax.vmap(lambda a, i, v: a.at[i].add(v.astype(jnp.float32)))(
      acc, ids, vals)


@jax.jit
def scatter_bf16(ids, vals):
  acc = jnp.zeros((B, RW, D), jnp.bfloat16)
  return jax.vmap(lambda a, i, v: a.at[i].add(v))(acc, ids, vals).astype(
      jnp.float32)


@jax.jit
def scatter_sorted(ids, vals):
  order = jnp.argsort(ids, axis=1)
  ids_s = jnp.take_along_axis(ids, order, axis=1)
  vals_s = jnp.take_along_axis(
      vals.astype(jnp.float32), order[..., None], axis=1)
  acc = jnp.zeros((B, RW, D), jnp.float32)
  return jax.vmap(
      lambda a, i, v: a.at[i].add(v, indices_are_sorted=True))(
          acc, ids_s, vals_s)


@jax.jit
def scatter_sorted_tap(ids, vals):
  # Per-tap sorted scatter: 4 sorts of N instead of one of 4N; transient
  # bounded to one tap's rows (the HBM-safe variant for training).
  acc = jnp.zeros((B, RW, D), jnp.float32)
  ids4 = ids.reshape(B, TAPS, N)
  vals4 = vals.astype(jnp.float32).reshape(B, TAPS, N, D)
  for t in range(TAPS):
    order = jnp.argsort(ids4[:, t], axis=1)
    i_s = jnp.take_along_axis(ids4[:, t], order, axis=1)
    v_s = jnp.take_along_axis(vals4[:, t], order[..., None], axis=1)
    acc = jax.vmap(
        lambda a, i, v: a.at[i].add(v, indices_are_sorted=True))(
            acc, i_s, v_s)
  return acc


@jax.jit
def scatter_segsum(ids, vals):
  order = jnp.argsort(ids, axis=1)
  ids_s = jnp.take_along_axis(ids, order, axis=1)
  vals_s = jnp.take_along_axis(
      vals.astype(jnp.float32), order[..., None], axis=1)
  cs = jnp.cumsum(vals_s, axis=1)
  # For each target row t: sum over its segment = cs[end(t)] - cs[end(t-1)]
  # where end(t) = index of the last contribution with id <= t (exclusive
  # prefix via searchsorted 'right').
  def per_b(ids_s, cs):
    ends = jnp.searchsorted(ids_s, jnp.arange(RW), side='right')  # [RW]
    starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
    padded = jnp.concatenate([jnp.zeros((1, D), cs.dtype), cs], axis=0)
    return padded[ends] - padded[starts]
  return jax.vmap(per_b)(ids_s, cs)


@jax.jit
def scatter_onehot(ids, vals):
  # Chunked one-hot matmul: out += onehot[N_chunk, RW].T @ vals[N_chunk, D].
  chunk = min(36_000, TAPS * N)
  assert (TAPS * N) % chunk == 0

  def per_b(ids, vals):
    def body(acc, xs):
      i, v = xs
      oh = jax.nn.one_hot(i, RW, dtype=jnp.bfloat16)
      return acc + jnp.einsum(
          'nr,nd->rd', oh, v, preferred_element_type=jnp.float32), None
    n_chunks = (TAPS * N) // chunk
    acc0 = jnp.zeros((RW, D), jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc0,
        (ids.reshape(n_chunks, chunk), vals.reshape(n_chunks, chunk, D)))
    return acc
  return jax.vmap(per_b)(ids, vals)


def timeit(fn, *args, iters=ITERS, sync=False):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  if sync:
    # Block every iteration: immune to any async-dispatch/dedup artifact in
    # the remote tunnel (the round-4 'current' row measured 0.3 ms at a
    # shape whose HBM floor is ~4 ms — impossible, so the pipelined timing
    # path cannot be trusted for sub-10ms programs on this backend).
    for _ in range(iters):
      jax.block_until_ready(fn(*args))
  else:
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
  return (time.perf_counter() - t0) / iters, out


def main():
  global B, N, RW, D
  iters = 3 if '--quick' in sys.argv else ITERS
  sync = '--sync' in sys.argv
  only = None
  for a in sys.argv[1:]:
    if a.startswith('--modes='):
      only = set(a.split('=')[1].split(','))
  for a in sys.argv[1:]:
    # --shape B,4N_total,RW,D — e.g. the template-sampling backward's
    # regime is --shape 2,627264,9801,33 (narrow rows, small target).
    if a.startswith('--shape'):
      B, total, RW, D = map(int, a.split('=')[1].split(','))
      N = total // TAPS
  print(json.dumps({'shape': {'B': B, 'contribs': TAPS * N,
                              'RW': RW, 'D': D}}))
  ids, vals = jax.device_put(make_inputs(jax.random.PRNGKey(0)))
  ref = None
  for name, fn in (
      ('current', scatter_current),
      ('bf16', scatter_bf16),
      ('sorted', scatter_sorted),
      ('sorted_tap', scatter_sorted_tap),
      ('segsum', scatter_segsum),
      ('onehot', scatter_onehot),
  ):
    if only is not None and name not in only:
      continue
    try:
      dt, out = timeit(fn, ids, vals, iters=iters, sync=sync)
      out = np.asarray(jax.device_get(out), np.float32)
      if ref is None:
        ref = out
      err = float(np.abs(out - ref).max())
      rel = err / max(float(np.abs(ref).max()), 1e-9)
      print(json.dumps({'name': name, 'ms': round(dt * 1e3, 2),
                        'max_abs_err': round(err, 5),
                        'max_rel_err': round(rel, 6)}))
    except Exception as e:  # pylint: disable=broad-except
      print(json.dumps({'name': name,
                        'error': f'{type(e).__name__}: {e}'[:200]}))


if __name__ == '__main__':
  main()
