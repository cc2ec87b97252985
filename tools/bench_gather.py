"""Micro-benchmarks for lifting-gather strategies on TPU.

Shapes mirror the eval-scale lift (snap_tpu/ops/view_scan.pool_views_stream):
stack [B, V*(h+1), w+1, C] bf16, per-point patch origins [B, N] — one 2x2xC
patch per (point, rank), K=4 ranks.

Strategies measured:
  xla_patch   — the production jax.lax.gather 2x2 slice gather.
  xla_fused4  — 4 rank gathers + softmax-weighted pooling in one jit (does
                XLA fuse away the per-rank intermediates?).
  pallas_slice— pallas kernel, VMEM-resident stack tile, serial fori_loop
                over points with dynamic 2-row slices.
  pallas_dyngather — probe: does jnp.take_along_axis lower in Mosaic here?
Run on the real TPU:  python tools/bench_gather.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snap_tpu.ops import view_scan

B, V, H, W, C = 1, 20, 45, 60, 160
N = 1_152_000  # 120 x 160 x 60 voxels
K = 4

R = V * (H + 1)
key = jax.random.PRNGKey(0)
stack = jax.random.normal(key, (B, R, W + 1, C), jnp.bfloat16)
row0 = jax.random.randint(jax.random.PRNGKey(1), (K, B, N), 0, R - 1)
col0 = jax.random.randint(jax.random.PRNGKey(2), (K, B, N), 0, W - 1)
frac = jax.random.uniform(jax.random.PRNGKey(3), (K, B, N, 2), jnp.bfloat16)
score = jax.random.normal(jax.random.PRNGKey(4), (K, B, N), jnp.float32)


def timeit(fn, *args, iters=6):
  out = fn(*args)
  jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
  float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    times.append(time.perf_counter() - t0)
  times.sort()
  return times[len(times) // 2]


@jax.jit
def xla_patch(stack, r0, c0):
  p = view_scan.gather_bilinear_patches(stack, r0, c0)
  return p.sum(dtype=jnp.float32)


@jax.jit
def xla_fused4(stack, row0, col0, frac, score):
  """4 ranks: gather + bilinear weight + softmax pooling, one jit."""
  m = jnp.max(score, axis=0)
  w_rank = jnp.exp(score - m)  # [K, B, N]
  l = w_rank.sum(0)
  s1 = jnp.zeros((B, N, C), jnp.float32)
  for k in range(K):
    patches = view_scan.gather_bilinear_patches(stack, row0[k], col0[k])
    wi = jnp.stack([1 - frac[k, ..., 0], frac[k, ..., 0]], -1)
    wj = jnp.stack([1 - frac[k, ..., 1], frac[k, ..., 1]], -1)
    wt = wi[..., :, None] * wj[..., None, :]
    f_k = jnp.einsum('bnij,bnijd->bnd', wt, patches).astype(jnp.float32)
    s1 = s1 + w_rank[k][..., None] * f_k
  return (s1 / l[..., None]).astype(jnp.bfloat16)


def pallas_slice_kernel(rid_ref, stack_ref, out_ref):
  t = rid_ref.shape[0]

  def body(i, _):
    rid = rid_ref[i]
    top = stack_ref[pl.ds(rid, 2), :]            # (r, c), (r, c+1)
    bot = stack_ref[pl.ds(rid + (W + 1), 2), :]  # (r+1, c), (r+1, c+1)
    out_ref[i, :] = (top + bot).sum(axis=0)
    return 0

  jax.lax.fori_loop(0, t, body, 0)


def make_pallas_slice(tile):
  grid = N // tile
  flat_rows = R * (W + 1)
  return pl.pallas_call(
      pallas_slice_kernel,
      grid=(grid,),
      in_specs=[
          pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
          pl.BlockSpec((flat_rows, C), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
  )


@jax.jit
def pallas_slice(stack, r0, c0):
  fn = make_pallas_slice(4096)
  rid = (r0[0, 0] * (W + 1) + c0[0, 0]).astype(jnp.int32)
  out = fn(rid, stack[0].reshape(R * (W + 1), C))
  return out.sum(dtype=jnp.float32)


def dyngather_kernel(ids_ref, table_ref, out_ref):
  # Probe: vectorized dynamic gather along axis 0 of a VMEM table.
  ids = jnp.broadcast_to(
      ids_ref[:][:, None].astype(jnp.int32),
      (ids_ref.shape[0], table_ref.shape[1]))
  out_ref[:] = jnp.take_along_axis(table_ref[:], ids, axis=0)


@jax.jit
def pallas_dyngather(table, ids):
  fn = pl.pallas_call(
      dyngather_kernel,
      grid=(ids.shape[0] // 2048,),
      in_specs=[
          pl.BlockSpec((2048,), lambda i: (i,), memory_space=pltpu.VMEM),
          pl.BlockSpec(table.shape, lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((2048, table.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((ids.shape[0], table.shape[1]),
                                     table.dtype),
  )
  return fn(ids, table).sum(dtype=jnp.float32)


def main():
  dev = jax.devices()[0]
  print('device:', dev)
  elems = B * N * 4 * C

  dt = timeit(xla_patch, stack, row0[0], col0[0])
  print(f'xla_patch: {dt*1e3:.1f} ms  ({elems/dt/1e9:.1f} G elem/s)')

  dt = timeit(xla_fused4, stack, row0, col0, frac, score)
  print(f'xla_fused4 (K=4 + pool): {dt*1e3:.1f} ms '
        f'({K*elems/dt/1e9:.1f} G gathered elem/s)')

  try:
    dt = timeit(pallas_slice, stack, row0, col0)
    print(f'pallas_slice: {dt*1e3:.1f} ms ({elems/dt/1e9:.1f} G elem/s)')
  except Exception as e:
    print(f'pallas_slice FAILED: {type(e).__name__}: {str(e)[:300]}')

  try:
    table = jax.random.normal(jax.random.PRNGKey(5), (8, 128), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(6), (N,), 0, 8)
    dt = timeit(pallas_dyngather, table, ids)
    print(f'pallas_dyngather (8-row table): {dt*1e3:.1f} ms')
  except Exception as e:
    print(f'pallas_dyngather FAILED: {type(e).__name__}: {str(e)[:300]}')


if __name__ == '__main__':
  main()
