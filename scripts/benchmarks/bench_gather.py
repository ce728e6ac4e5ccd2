"""Measure raw XLA row-gather throughput on TPU vs row width.

The DCN is gather-bound; this pins down the per-row vs per-byte cost of
jnp.take(table, rows, axis=0) so the packing strategy (how many channels
to fold into one gathered row) is chosen from data.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/benchmarks/bench_gather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 2_000_000   # gathered rows per call
TABLE_ROWS = 200_000


def bench_width(width, dtype=jnp.bfloat16, iters=10):
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(TABLE_ROWS, width), dtype)
    idx = jnp.asarray(rng.randint(0, TABLE_ROWS, N_ROWS, dtype=np.int64),
                      jnp.int32)

    @jax.jit
    def step(idx):
        g = jnp.take(table, idx, axis=0)
        # fold the gather result into the next iteration's indices so the
        # runtime cannot elide or overlap-memoize repeated calls
        bump = (g.astype(jnp.float32).ravel()[0] * 0).astype(jnp.int32)
        return idx + bump, g.astype(jnp.float32).mean()

    idx, m = step(idx)
    jax.block_until_ready((idx, m))
    t0 = time.perf_counter()
    for _ in range(iters):
        idx, m = step(idx)
    jax.block_until_ready((idx, m))
    dt = (time.perf_counter() - t0) / iters
    bytes_ = N_ROWS * width * np.dtype(dtype.dtype if hasattr(
        dtype, 'dtype') else np.float16).itemsize
    print(f'width {width:4d} ({width*2:5d} B/row): {dt*1e3:8.2f} ms  '
          f'{N_ROWS/dt/1e6:7.1f} Mrow/s  {bytes_/dt/1e9:7.1f} GB/s')


def bench_table(table_rows, width=32, iters=10):
    global TABLE_ROWS
    old = TABLE_ROWS
    TABLE_ROWS = table_rows
    try:
        print(f'table {table_rows:8d} rows: ', end='')
        bench_width(width, iters=iters)
    finally:
        TABLE_ROWS = old


if __name__ == '__main__':
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == 'tables':
        for tr in (100_000, 200_000, 400_000, 800_000, 1_600_000):
            bench_table(tr)
    else:
        for w in (8, 16, 32, 64, 128, 256):
            bench_width(w)
