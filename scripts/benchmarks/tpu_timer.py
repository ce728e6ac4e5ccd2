"""Reliable TPU timing under an async dispatch tunnel.

Host-side loops + block_until_ready mis-measure through the axon relay
(dispatch-only returns, result memoization). This harness instead:
  - runs N iterations inside ONE jitted lax.scan,
  - threads a genuine data dependency through the carry (the next
    iteration's input depends on the previous output, via a value-
    preserving bump that XLA cannot fold away),
  - forces a D2H transfer of the reduced result (a real completion
    barrier),
  - reports (t[N] - t[1]) / (N - 1), cancelling dispatch + transfer
    overhead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, carry0, *args, n=10):
    """Times one fn(carry, *args) -> (carry, out-pytree) iteration.

    fn must return a carry with the same structure/dtypes as carry0.
    """
    def run_n(length):
        @jax.jit
        def run(c0, *a):
            def body(c, _):
                c2, out = fn(c, *a)
                s = sum(jnp.sum(leaf.astype(jnp.float32))
                        for leaf in jax.tree_util.tree_leaves(out))
                return c2, s
            cf, ss = jax.lax.scan(body, c0, None, length=length)
            return ss.sum()
        return run

    def measure(run, reps=3):
        m = run(carry0, *args)
        float(m)  # force completion (D2H)
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            m = run(carry0, *args)
            float(m)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = measure(run_n(1))
    tn = measure(run_n(n))
    return (tn - t1) / (n - 1)


def dep_carry(out, carry):
    """A value-preserving carry update that depends on out (anti-fold):
    adds (leaf[0] - leaf[0]) computed via a non-foldable round trip."""
    leaf = jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[0]
    bump = jnp.where(jnp.isnan(leaf), 1.0, 0.0)  # 0 in practice, data-dep
    return jax.tree_util.tree_map(
        lambda c: c + bump.astype(c.dtype), carry)
