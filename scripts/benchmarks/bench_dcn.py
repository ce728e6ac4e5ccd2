"""Microbenchmark: DCNv2 fwd / fwd+bwd at the stage3 MRAPA shapes.

Shapes mirror DynAgg at the three decoder levels for gt_size=160
(reference stage3_5ref_restoration_mse.yml): relu3_1 40x40x256,
relu2_1 80x80x128, relu1_1 160x160x64, deform_groups=8, k=3x3.
The backward matches training: grads wrt offset/mask/weight only (the
DCN input is a frozen VGG feature in the MRAPA stack, so no dx scatter).

Timing uses the scan-based harness (tpu_timer) — host loops through the
device tunnel mis-measure.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/benchmarks/bench_dcn.py [batch]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, 'scripts/benchmarks')
from tpu_timer import dep_carry, scan_time  # noqa: E402

from mrefsr_tpu.ops import modulated_deform_conv2d  # noqa: E402

LEVELS = {
    'relu3_1': (40, 256),
    'relu2_1': (80, 128),
    'relu1_1': (160, 64),
}


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

        def fwd(off, x, m, w):
            out = modulated_deform_conv2d(x, off, m, w, stride=1,
                                          padding=1, deform_groups=dg)
            return dep_carry(out, off), out

        def fwdbwd(off, x, m, w):
            def loss(off_, m_, w_):
                o = modulated_deform_conv2d(x, off_, m_, w_, stride=1,
                                            padding=1, deform_groups=dg)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            g = jax.grad(loss, argnums=(0, 1, 2))(off, m, w)
            return dep_carry(g, off), g

        tf = scan_time(fwd, offset, x, mask, w, n=8)
        tb = scan_time(fwdbwd, offset, x, mask, w, n=8)
        rows = n * hw * hw * dg * k
        print(f'{name}: b={n} {hw}x{hw}x{c} fwd {tf*1e3:7.2f} ms '
              f'({rows/tf/1e6:7.1f} Mrow/s)   fwd+bwd {tb*1e3:7.2f} ms')


if __name__ == '__main__':
    main()
