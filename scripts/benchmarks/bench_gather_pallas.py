"""Can a Pallas kernel beat XLA's row-gather rate at the DCN shapes?

Experiment at the relu1_1 slab scale: table (161*161, 32->128 padded)
bf16 resident in VMEM, 230400 row indices per (item, group) slab.
  A: XLA jnp.take per slab under scan (the current ops/dcn.py form)
  B: pallas kernel, grid over (slab, index chunk), jnp.take inside
     (Mosaic dynamic_gather), table padded to 128 lanes (Mosaic tiling
     requires last-dim % 128; gather is row-rate-bound so the wasted
     lanes should not matter)
If B does not clearly exceed A, XLA's gather is already at the
hardware row rate and a custom DCN kernel is not worth the complexity.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/benchmarks/bench_gather_pallas.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, 'scripts/benchmarks')
from tpu_timer import dep_carry, scan_time  # noqa: E402

P = 161 * 161          # table rows per slab
PP = 25928             # P padded to a multiple of 8
W = 32                 # true row width (4*cg at relu1_1)
WP = 128               # padded to the lane width
M = 160 * 160 * 9      # gathered rows per slab (taps folded in)
SLABS = 8              # (item, group) slabs scanned (subset of 4*8)
CHUNK = 5120           # index rows per grid step (CHUNK/128=40 %8==0, divides M)


def xla_take(idx, tables):
    def body(_, xs):
        tab, ix = xs
        return None, jnp.take(tab, ix.reshape(-1), axis=0)
    _, out = jax.lax.scan(body, None, (tables, idx))
    return out


def gather_kernel(idx_ref, tab_ref, out_ref):
    # Mosaic's sublane dynamic_gather wants take_along_axis semantics:
    # per-(row, lane) indices, broadcast across lanes
    idx = idx_ref[0].reshape(-1, 1)
    idxb = jnp.broadcast_to(idx, (idx.shape[0], WP))
    out_ref[0] = jnp.take_along_axis(tab_ref[0], idxb, axis=0)


@jax.jit
def pallas_take(idx, tables):
    grid = (SLABS, M // CHUNK)
    return pl.pallas_call(
        gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CHUNK // 128, 128), lambda s, c: (s, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PP, WP), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, WP), lambda s, c: (s, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SLABS, M, WP), tables.dtype),
    )(idx, tables)


def bench(name, fn, idx, tables):
    def step(ix, tab):
        out = fn(ix, tab)
        return dep_carry(out, ix), out[..., :1]

    dt = scan_time(step, idx, tables, n=6)
    rows = SLABS * M
    print(f'{name:28s} {dt*1e3:8.2f} ms  {rows/dt/1e6:7.1f} Mrow/s',
          flush=True)


def main():
    rng = np.random.RandomState(0)
    tables32 = jnp.asarray(rng.rand(SLABS, P, W), jnp.bfloat16)
    tables128 = jnp.zeros((SLABS, PP, WP), jnp.bfloat16).at[
        :, :P, :W].set(tables32)
    idx = jnp.asarray(rng.randint(0, P, (SLABS, M // 128, 128)),
                      jnp.int32)

    bench('A xla take w32 (scan)', jax.jit(xla_take), idx, tables32)
    bench('A2 xla take w128 (scan)', jax.jit(xla_take), idx, tables128)
    try:
        bench('B pallas take w128', pallas_take, idx, tables128)
    except Exception as e:  # noqa: BLE001 — experiment harness
        print(f'B pallas take w128           FAILED: '
              f'{type(e).__name__}: {str(e)[:200]}',
              flush=True)


if __name__ == '__main__':
    main()
