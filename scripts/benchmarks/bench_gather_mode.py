"""Gather OOB-mode experiments at the DCN slab scale.

The DCN row indices are provably in-bounds by construction
(_corner_rows_and_weights clips yc to [0,H], xc to [0,W] before
linearizing), yet jnp.take's default mode ('fill') lowers to a
bounds-check + select around every gathered row. This measures the
slab-scan gather (ops/dcn.py form C) under the three modes, forward
and forward+backward (the backward's transposed scatter also carries
the bounds handling).

Usage: PYTHONPATH=/root/.axon_site:. python \
    scripts/benchmarks/bench_gather_mode.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, 'scripts/benchmarks')
from tpu_timer import dep_carry, scan_time  # noqa: E402

B, P, DG, K, W = 4, 161 * 161, 8, 9, 32
PO = 160 * 160


def make_gather(mode):
    def per_item_group(idx, table):
        t = jnp.moveaxis(table, 2, 1).reshape(B * DG, P, W)
        ix = jnp.moveaxis(idx, 2, 1).reshape(B * DG, PO, K)

        def body(_, inp):
            t_g, ix_g = inp  # (P,W), (PO,K)
            rows = ix_g.reshape(-1)
            if mode is None:
                g = jnp.take(t_g, rows, axis=0)
            elif mode == 'promise_in_bounds':
                g = t_g.at[rows].get(mode='promise_in_bounds')
            else:
                g = jnp.take(t_g, rows, axis=0, mode=mode)
            return None, g.reshape(PO, K, W)
        _, out = jax.lax.scan(body, None, (t, ix))
        return out.reshape(B, DG, PO, K, W)
    return per_item_group


def bench(name, fn, idx0, table, grad=False):
    if grad:
        def loss(idx, table):
            return jnp.sum(fn(idx, table).astype(jnp.float32))

        g = jax.grad(loss, argnums=1)

        def step(idx, table):
            out = g(idx, table)
            return dep_carry(out[0, 0, 0, :1], idx), out
    else:
        def step(idx, table):
            out = fn(idx, table)
            return dep_carry(out, idx), out

    dt = scan_time(step, idx0, table, n=8)
    nrows = B * PO * DG * K
    print(f'{name:46s} {dt*1e3:8.2f} ms  {nrows/dt/1e6:7.1f} Mrow/s',
          flush=True)


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(B, P, DG, W), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, P, (B, PO, DG, K)), jnp.int32)

    for mode in (None, 'clip', 'promise_in_bounds'):
        bench(f'fwd  mode={mode}', make_gather(mode), idx, table)
    for mode in (None, 'clip', 'promise_in_bounds'):
        bench(f'fwd+bwd(scatter) mode={mode}', make_gather(mode), idx,
              table, grad=True)


if __name__ == '__main__':
    main()
