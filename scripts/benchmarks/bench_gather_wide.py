"""Shared-patch-row DCN gather: measured go/no-go (VERDICT r3 #2).

The DCN forward is bound by bilinear row-gathers (~318-361 Mrow/s from
VMEM slabs, docs/TPUDesign.md). All 9 taps of DynAgg share one integer
pre-offset flow per (pixel, group), so their bilinear corners cluster
in a small neighborhood: ONE wider gathered row covering that
neighborhood could replace the 9 corner-packed rows — IF row-gather
throughput really is row-count-bound (width-free) at these widths, and
IF the in-patch per-tap bilinear combine (VPU work replacing the
slice-combine) doesn't eat the savings.

Variants, all producing the 9 tap samples of a 3x3 DCN at the
relu1_1 'large' scale (H=W=160, dg=8, cg=8, b=4; row counts per
(item, group) slab):

  cur4     corner-packed rows, 4cg wide, 9 rows/pixel (the shipped path)
  strip6   6-wide row strips (y, x0:x0+6), 6cg, 6 rows/pixel
  brick12  2x6 bricks, 12cg, 3 rows/pixel
  patch25  5x5 patches, 25cg, 1 row/pixel (covers |residual| < ~0.5)
  patch36  6x6 patches, 36cg, 1 row/pixel (covers |residual| < ~1.5)

plus: index-duplication sensitivity (all-equal vs random rows — decides
whether a degenerate-row fallback pass can be cheap), and the
end-to-end produce-9-taps time (gather + combine) for cur4 vs patch36.

Usage: PYTHONPATH=/root/.axon_site:. python \
    scripts/benchmarks/bench_gather_wide.py [--h 160] [--b 4]
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, 'scripts/benchmarks')
from tpu_timer import dep_carry, scan_time  # noqa: E402


def bench(name, fn, idx0, table, rows_total, n=8):
    def body(idx, table):
        out = fn(idx, table)
        return dep_carry(out, idx), out

    dt = scan_time(body, idx0, table, n=n)
    print(f'{name:34s} {dt*1e3:8.2f} ms  {rows_total/dt/1e6:7.1f} Mrow/s')
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--h', type=int, default=160)
    ap.add_argument('--b', type=int, default=4)
    ap.add_argument('--cg', type=int, default=8)
    ap.add_argument('--dg', type=int, default=8)
    args = ap.parse_args()
    H = W = args.h
    B, DG, CG = args.b, args.dg, args.cg
    PO = H * W
    S = B * DG  # slabs
    rng = np.random.RandomState(0)

    print(f'H=W={H} B={B} dg={DG} cg={CG}: '
          f'{S} slabs x {PO} pixels, 9-tap DCN')

    # --- gather-only comparisons: tables prebuilt (the pack runs once
    # per forward outside the slab scan in the real op), one slab
    # gathered per lax.scan step like ops/dcn.py
    def make(rows_tab, width, rows_per_px):
        tab = jnp.asarray(rng.rand(S, rows_tab, width), jnp.bfloat16)
        idx = jnp.asarray(
            rng.randint(0, rows_tab, (S, PO * rows_per_px)), jnp.int32)
        mb = rows_tab * width * 2 / 1e6

        def fn(idx, table):
            def body(_, inp):
                t_g, ix_g = inp
                return None, jnp.take(t_g, ix_g, axis=0)
            _, out = jax.lax.scan(body, None, (table, idx))
            return out
        return fn, idx, tab, S * PO * rows_per_px, mb

    variants = [
        ('cur4', (H + 1) * (W + 1), 4 * CG, 9),
        ('strip6', (H + 5) * (W + 5), 6 * CG, 6),
        ('brick12', (H + 5) * (W + 5), 12 * CG, 3),
        ('patch25', (H + 4) * (W + 4), 25 * CG, 1),
        ('patch36', (H + 5) * (W + 5), 36 * CG, 1),
    ]
    times = {}
    for name, rows_tab, width, rpp in variants:
        fn, idx, tab, total, mb = make(rows_tab, width, rpp)
        label = f'{name} w={width} ({mb:.1f}MB, {rpp}r/px)'
        times[name] = bench(label, fn, idx, tab, total)

    # --- index-duplication sensitivity on cur4 (fallback-pass question)
    fn, idx, tab, total, _ = make((H + 1) * (W + 1), 4 * CG, 9)
    bench('cur4 random idx', fn, idx, tab, total)
    bench('cur4 all-equal idx', fn, jnp.zeros_like(idx), tab, total)
    mostly = np.asarray(idx)
    keep = rng.rand(*mostly.shape) < 0.02  # 2% real rows
    mostly = jnp.asarray(np.where(keep, mostly, 0))
    bench('cur4 98% duplicated idx', fn, mostly, tab, total)

    # --- end-to-end produce-9-taps: gather + combine
    # cur4: corner-packed row -> 4-slice weighted sum (ops/dcn.py form)
    def cur4_full(inp, table):
        idx, wcorner = inp  # (S, PO*9), (S, PO*9, 4)

        def body(_, t_in):
            t_g, ix_g, w_g = t_in
            g4 = jnp.take(t_g, ix_g, axis=0)  # (PO*9, 4cg)
            out = sum(g4[:, i * CG:(i + 1) * CG] * w_g[:, i:i + 1]
                      for i in range(4))
            return None, out
        _, out = jax.lax.scan(body, None, (table, idx, wcorner))
        return out

    _, idx4, tab4, total4, _ = make((H + 1) * (W + 1), 4 * CG, 9)
    wc = jnp.asarray(rng.rand(S, PO * 9, 4), jnp.bfloat16)
    bench('cur4 gather+combine', cur4_full, (idx4, wc), tab4, total4)

    # patch36: one patch row -> separable 6x6 bilinear per tap
    # weights w[p,t,s] = relu(1-|q-s|), computed from per-tap in-patch
    # float coords (the real op derives q from frac(flow)+residual)
    def patch_full(inp, table):
        idx, qy, qx = inp  # (S,PO), (S,PO,9), (S,PO,9)
        grid = jnp.arange(6, dtype=jnp.bfloat16)

        def body(_, t_in):
            t_g, ix_g, qy_g, qx_g = t_in
            g = jnp.take(t_g, ix_g, axis=0)          # (PO, 36cg)
            g = g.reshape(PO, 6, 6, CG)
            wy = jax.nn.relu(1.0 - jnp.abs(
                qy_g[..., None] - grid))             # (PO, 9, 6)
            wx = jax.nn.relu(1.0 - jnp.abs(
                qx_g[..., None] - grid))
            tmp = jnp.einsum('pty,pyxc->ptxc', wy, g)  # (PO, 9, 6, CG)
            out = jnp.einsum('ptx,ptxc->ptc', wx, tmp)
            return None, out
        _, out = jax.lax.scan(body, None, (table, idx, qy, qx))
        return out

    _, idxp, tabp, totalp, _ = make((H + 5) * (W + 5), 36 * CG, 1)
    qy = jnp.asarray(rng.uniform(0.5, 4.5, (S, PO, 9)), jnp.bfloat16)
    qx = jnp.asarray(rng.uniform(0.5, 4.5, (S, PO, 9)), jnp.bfloat16)
    bench('patch36 gather+combine', patch_full, (idxp, qy, qx), tabp,
          totalp)

    rel = times.get('patch36', 1) / max(times.get('cur4', 1), 1e-9)
    print(f"\npatch36/cur4 gather-only time ratio: {rel:.2f} "
          f"(<0.5 = strong go for the shared-row redesign)")


if __name__ == '__main__':
    main()
