"""Row-gather rate as a function of table-operand size.

Determines where the VMEM-slab gather rate falls off — this sizes the
multipass partitioned gather for big-slab cases (e.g. CUFED5 500x500
eval, where the per-(item, group) slab is 16 MB > VMEM).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/benchmarks/bench_gather_tablesize.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, 'scripts/benchmarks')
from tpu_timer import dep_carry, scan_time  # noqa: E402

W = 32            # bf16 lanes per row (64 B)
M = 230400        # rows gathered per scan step
STEPS = 8         # scan length (distinct tables to avoid caching)


def main():
    rng = np.random.RandomState(0)
    for p in (25921, 51842, 103684, 207368, 414736, 829472):
        mb = p * W * 2 / 1e6
        tables = jnp.asarray(rng.rand(STEPS, p, W), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, p, (STEPS, M)), jnp.int32)

        def fn(ix, tabs):
            def body(_, xs):
                tab, i = xs
                return None, jnp.take(tab, i, axis=0)
            _, out = jax.lax.scan(body, None, (tabs, ix))
            return dep_carry(out, ix), out[..., :1]

        dt = scan_time(fn, idx, tables, n=4) / STEPS
        print(f'table {p:7d} rows ({mb:6.1f} MB): '
              f'{M/dt/1e6:7.1f} Mrow/s', flush=True)


if __name__ == '__main__':
    main()
