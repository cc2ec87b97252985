"""Pallas probe: can a DMA-pipelined patch gather beat XLA's gather?

Round-2 measured the lift's 2x2xC patch gather as descriptor-bound in XLA:
~23.5M descriptors/s on the production shape (1.15M points x 2x2x160 bf16
slices from a [920, 61, C] row-padded image stack), independent of slice
bytes (docs/PERFORMANCE.md). The VMEM-resident in-vreg alternative is
blocked by Mosaic's 8-aligned dynamic-sublane restriction, so the one
remaining design is DMA-per-point: a grid over point tiles whose kernel
issues one small async copy per point from the HBM-resident stack, with a
ring of outstanding DMAs to cover latency.

This probe measures that kernel on the production shape and prints a
desc/s number to compare against the 23.5M/s XLA bound — keeping or
retiring the Pallas-gather idea with data (round-2 verdict item #8).

Usage:
  JAX_PLATFORMS=cpu python tools/pallas_gather_probe.py --check   # interpret
  python tools/pallas_gather_probe.py                             # TPU bench
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RING = 16  # outstanding DMAs per tile pipeline


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def patch_gather_pallas(stack, row0, col0, *, tile: int = 512,
                        interpret: bool = False):
  """[R, W, C] stack + [N] origins -> [N, 2, 2, C] patches via per-point DMA."""
  n = row0.shape[0]
  r, w, c = stack.shape
  assert n % tile == 0, (n, tile)

  def kernel(row_ref, col_ref, stack_ref, out_ref, sems):
    def start(j):
      dma = pltpu.make_async_copy(
          stack_ref.at[pl.ds(row_ref[j], 2), pl.ds(col_ref[j], 2), :],
          out_ref.at[j],
          sems.at[j % RING],
      )
      dma.start()

    def wait(j):
      pltpu.make_async_copy(
          stack_ref.at[pl.ds(row_ref[j], 2), pl.ds(col_ref[j], 2), :],
          out_ref.at[j],
          sems.at[j % RING],
      ).wait()

    def body(j, _):
      @pl.when(j < tile)
      def _():
        start(j)

      @pl.when(j >= RING)
      def _():
        wait(j - RING)

      return 0

    jax.lax.fori_loop(0, tile + RING, body, 0)

  grid = (n // tile,)
  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
          pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
          pl.BlockSpec(memory_space=pltpu.ANY),  # stack stays in HBM
      ],
      out_specs=pl.BlockSpec(
          (tile, 2, 2, c), lambda i: (i, 0, 0, 0),
          memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, 2, 2, c), stack.dtype),
      scratch_shapes=[pltpu.SemaphoreType.DMA((RING,))],
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
      interpret=interpret,
  )(row0, col0, stack)


def reference(stack, row0, col0):
  r, w, c = stack.shape
  flat = stack.reshape(r * w, c)
  out = []
  for di in (0, 1):
    for dj in (0, 1):
      idx = (row0 + di) * w + (col0 + dj)
      out.append(jnp.take(flat, idx, axis=0))
  return jnp.stack(out, 1).reshape(-1, 2, 2, c)


def check():
  rng = np.random.default_rng(0)
  r, w, c, n = 12, 9, 128, 64
  stack = jnp.asarray(rng.normal(size=(r, w, c)), jnp.float32)
  row0 = jnp.asarray(rng.integers(0, r - 1, size=n), jnp.int32)
  col0 = jnp.asarray(rng.integers(0, w - 1, size=n), jnp.int32)
  got = patch_gather_pallas(stack, row0, col0, tile=32, interpret=True)
  want = reference(stack, row0, col0)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want))
  print('interpret-mode parity OK')


def bench():
  from snap_tpu.ops import view_scan

  rng = np.random.default_rng(0)
  # Parity on a small slice first (on the real backend).
  r0, w0, c0, n0 = 40, 20, 192, 2048
  s0 = jnp.asarray(rng.normal(size=(r0, w0, c0)), jnp.float32)
  rr = jnp.asarray(rng.integers(0, r0 - 1, size=n0), jnp.int32)
  cc = jnp.asarray(rng.integers(0, w0 - 1, size=n0), jnp.int32)
  try:
    got = patch_gather_pallas(s0, rr, cc, tile=512)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(reference(s0, rr, cc)))
    print('device parity OK')
  except Exception as e:  # pylint: disable=broad-except
    print(f'device parity FAILED: {type(e).__name__}: {str(e)[:400]}')
    return 1
  # Production shape: 20 views of 46x61 rows stacked, C=192 (160 feat + 32
  # score bins), 1.15M descriptors (120x160x60 grid points, one rank).
  r, w, c = 20 * 46, 61, 192
  n = 1_152_000
  stack = jnp.asarray(rng.normal(size=(r, w, c)), jnp.bfloat16)
  row0 = jnp.asarray(rng.integers(0, r - 2, size=n), jnp.int32)
  col0 = jnp.asarray(rng.integers(0, w - 2, size=n), jnp.int32)
  failures = 0

  def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    for o in outs[:-1]:
      jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters

  dt_xla = timeit(
      lambda: view_scan.gather_bilinear_patches(
          stack[None], row0[None], col0[None]))
  print(f'XLA patch gather:    {dt_xla*1e3:7.1f} ms  '
        f'({n/dt_xla/1e6:.1f}M desc/s)')

  for tile in (512, 2048, 8192):
    try:
      dt = timeit(lambda t=tile: patch_gather_pallas(
          stack, row0, col0, tile=t))
      print(f'Pallas DMA (t={tile:5d}): {dt*1e3:7.1f} ms  '
            f'({n/dt/1e6:.1f}M desc/s)')
    except Exception as e:  # pylint: disable=broad-except
      print(f'Pallas DMA (t={tile}): FAILED {type(e).__name__}: '
            f'{str(e)[:300]}')
      failures += 1
  return 1 if failures else 0


if __name__ == '__main__':
  if '--check' in sys.argv:
    check()
  else:
    # Exit nonzero when Mosaic cannot compile / parity fails on-device, so
    # the supervisor's recorded rc distinguishes success from the known
    # tunnel remote-compile blocker (docs/PERFORMANCE.md).
    sys.exit(bench())
