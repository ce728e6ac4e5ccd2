"""Microbenchmark: DCNv2 fwd / fwd+bwd at the stage3 MRAPA shapes.

Shapes mirror DynAgg at the three decoder levels for gt_size=160
(reference stage3_5ref_restoration_mse.yml): relu3_1 40x40x256,
relu2_1 80x80x128, relu1_1 160x160x64, deform_groups=8, k=3x3.

Usage: python scripts/benchmarks/bench_dcn.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.ops import modulated_deform_conv2d

LEVELS = {
    'relu3_1': (40, 256),
    'relu2_1': (80, 128),
    'relu1_1': (160, 64),
}


def bench(fn, x, *args, iters=20):
    """Times fn with a data-dependency chain (x perturbed by the previous
    output) so no run can be elided or memoized by the runtime."""
    @jax.jit
    def step(x):
        out = fn(x, *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        bump = (leaf.astype(jnp.float32).ravel()[0] * 1e-12).astype(x.dtype)
        return x + bump, out

    x, out = step(x)
    jax.block_until_ready((x, out))
    t0 = time.perf_counter()
    for _ in range(iters):
        x, out = step(x)
    jax.block_until_ready((x, out))
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dg, k = 8, 9
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    for name, (hw, c) in LEVELS.items():
        x = jnp.asarray(rng.rand(n, hw, hw, c), dtype)
        offset = jnp.asarray(rng.randn(n, hw, hw, dg, k, 2) * 8, dtype)
        mask = jnp.asarray(rng.rand(n, hw, hw, dg, k), dtype)
        w = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, dtype)

        fwd = jax.jit(lambda *a: modulated_deform_conv2d(
            *a, stride=1, padding=1, deform_groups=dg))

        def loss(*a):
            return jnp.sum(modulated_deform_conv2d(
                *a, stride=1, padding=1, deform_groups=dg)
                .astype(jnp.float32) ** 2)
        fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

        tf = bench(fwd, x, offset, mask, w)
        tb = bench(fwdbwd, x, offset, mask, w, iters=10)
        rows = n * hw * hw * dg * k
        print(f'{name}: b={n} {hw}x{hw}x{c} fwd {tf*1e3:7.2f} ms '
              f'({rows/tf/1e6:7.1f} Mrow/s)   fwd+bwd {tb*1e3:7.2f} ms')


if __name__ == '__main__':
    main()
