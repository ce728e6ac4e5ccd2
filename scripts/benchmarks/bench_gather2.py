"""Partitioned-gather experiments at the relu1_1 DCN scale.

The XLA row-gather may run faster when the table operand is small enough
to stage in VMEM. The DCN's per-(item, deform-group) index space is
naturally partitioned, so test gathering per slab under lax.scan.

Shapes: relu1_1 level, b=4: table (4, 161*161, 8, 32) bf16, indices
(4, 160*160, 8, 9) into the per-(item,group) 161*161 row space.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/benchmarks/bench_gather2.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, 'scripts/benchmarks')
from tpu_timer import dep_carry, scan_time  # noqa: E402

B, P, DG, K, W = 4, 161 * 161, 8, 9, 32
PO = 160 * 160  # output points per item


def bench(name, gather_fn, idx0, table):
    def fn(idx, table):
        out = gather_fn(idx, table)
        return dep_carry(out, idx), out

    dt = scan_time(fn, idx0, table, n=8)
    nrows = B * PO * DG * K
    print(f'{name:44s} {dt*1e3:8.2f} ms  {nrows/dt/1e6:7.1f} Mrow/s')


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(B, P, DG, W), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, P, (B, PO, DG, K)), jnp.int32)

    # A: one flat gather over the whole (B*P*DG) row space
    def flat(idx, table):
        t = jnp.moveaxis(table, 2, 1).reshape(B * DG * P, W)
        b_i = jnp.arange(B).reshape(B, 1, 1, 1)
        g_i = jnp.arange(DG).reshape(1, 1, DG, 1)
        rows = (b_i * DG + g_i) * P + idx
        return jnp.take(t, rows.reshape(-1), axis=0).reshape(
            B, PO, DG, K, W)
    bench('A: flat 53MB table', flat, idx, table)

    # B: scan over items (13.3MB slab each)
    def per_item(idx, table):
        def body(_, inp):
            t_i, ix_i = inp  # (P,DG,W), (PO,DG,K)
            t = jnp.moveaxis(t_i, 1, 0).reshape(DG * P, W)
            g_i = jnp.arange(DG).reshape(1, DG, 1)
            rows = g_i * P + ix_i
            return None, jnp.take(t, rows.reshape(-1), axis=0).reshape(
                PO, DG, K, W)
        _, out = jax.lax.scan(body, None, (table, idx))
        return out
    bench('B: scan items (13.3MB slabs)', per_item, idx, table)

    # C: scan over (item, group) pairs (1.66MB slab each)
    def per_item_group(idx, table):
        t = jnp.moveaxis(table, 2, 1).reshape(B * DG, P, W)
        ix = jnp.moveaxis(idx, 2, 1).reshape(B * DG, PO, K)

        def body(_, inp):
            t_g, ix_g = inp  # (P,W), (PO,K)
            return None, jnp.take(t_g, ix_g.reshape(-1), axis=0).reshape(
                PO, K, W)
        _, out = jax.lax.scan(body, None, (t, ix))
        return out.reshape(B, DG, PO, K, W)
    bench('C: scan item*group (1.66MB slabs)', per_item_group, idx, table)

    # D: like C but also scanning taps (288 small gathers)
    def per_item_group_tap(idx, table):
        t = jnp.moveaxis(table, 2, 1).reshape(B * DG, P, W)
        ix = jnp.moveaxis(idx, 2, 1).reshape(B * DG, PO, K)

        def body(_, inp):
            t_g, ix_g = inp

            def tap(_, ix_k):
                return None, jnp.take(t_g, ix_k, axis=0)
            _, o = jax.lax.scan(tap, None, jnp.moveaxis(ix_g, 1, 0))
            return None, o
        _, out = jax.lax.scan(body, None, (t, ix))
        return out
    bench('D: scan item*group, inner tap scan', per_item_group_tap,
          idx, table)


if __name__ == '__main__':
    main()
