"""Flagship EVAL throughput: the CUFED5-protocol 5-ref x4 forward
(500x500 zero-padded inputs, the reference's static eval canvas) in
images/sec on the attached chip(s) — the serving-side counterpart of
bench.py's training number.

Measures N jitted forwards fused into one lax.scan dispatch with the
same (tN - t1)/(N - 1) dispatch-overhead cancellation as bench.py.

Usage: python scripts/benchmarks/bench_eval.py  [BENCH_EVAL_SIZE=500]

``BENCH_EVAL_SIZE`` also accepts ``HxW`` (e.g. ``500x332``) to measure
a rectangular bucket canvas — the serving shape the per-dimension
``pad_to`` buckets produce for typical ~500x332 CUFED5 images.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..', '..'))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    size = os.environ.get('BENCH_EVAL_SIZE', '500')
    h, _, w = size.partition('x')
    h, w = int(h), int(w or h)
    # mirror the CUFED5 eval: pad to a multiple of 4 at the eval canvas
    gt_h, gt_w = h - h % 4, w - w % 4
    t = 5
    # BENCH_EVAL_BATCH > 1 measures batched (throughput) serving; the
    # reported img/s scales by the batch
    b = int(os.environ.get('BENCH_EVAL_BATCH', '1'))

    extractor, net_map, net_g = ge._flagship(
        ngf=64, n_blocks=16, groups=8,
        alignment=os.environ.get('BENCH_ALIGNMENT', 'dcn'))
    rng = np.random.RandomState(0)
    match_img = jnp.asarray(
        rng.rand(b, gt_h, gt_w, 3).astype(np.float32))
    refs = jnp.asarray(
        rng.rand(b, t, gt_h, gt_w, 3).astype(np.float32))
    lq = jnp.asarray(
        rng.rand(b, gt_h // 4, gt_w // 4, 3).astype(np.float32))
    vars_ex, vars_map, vars_g = ge._init_vars(extractor, net_map, net_g,
                                              match_img, refs, lq)
    forward = ge._forward_fn(extractor, net_map, net_g)

    # BENCH_EVAL_MP=bfloat16 measures the opt-in bf16 serving path
    # (val: mixed_precision: bfloat16 in the eval YAML)
    mp = os.environ.get('BENCH_EVAL_MP', '')
    if mp == 'bfloat16':
        cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda v: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 else v, t)
        vars_ex, vars_map, vars_g = cast(vars_ex), cast(vars_map), \
            cast(vars_g)
        match_img = match_img.astype(jnp.bfloat16)
        refs = refs.astype(jnp.bfloat16)
        lq = lq.astype(jnp.bfloat16)

    def run_steps(length):
        @jax.jit
        def run(vars_ex, vars_map, vars_g, match_img, refs, lq):
            def body(carry, idx):
                # each iteration depends on the previous so the scan
                # cannot be collapsed
                out = forward(vars_ex, vars_map, vars_g,
                              match_img + (carry * 0).astype(
                                  match_img.dtype), refs, lq)
                return out.mean().astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(length))
            return s
        return run

    args = (vars_ex, vars_map, vars_g, match_img, refs, lq)
    n = max(2, int(os.environ.get('BENCH_EVAL_STEPS', '8')))

    def measure(run, reps=2):
        best = float('inf')
        float(run(*args))  # compile + warm
        for _ in range(reps):
            start = time.perf_counter()
            float(run(*args))  # D2H completion barrier
            best = min(best, time.perf_counter() - start)
        return best

    t1 = measure(run_steps(1))
    tn = measure(run_steps(n))
    elapsed = max(tn - t1, 1e-9) / (n - 1)
    print(json.dumps({
        'metric': 'cufed5_5ref_x4_eval_imgs_per_sec_'
                  + (f'{gt_h}px' if gt_h == gt_w else
                     f'{gt_h}x{gt_w}px')
                  + ('_bf16' if mp == 'bfloat16' else ''),
        'value': round(b / elapsed, 3),
        'unit': 'images/sec/chip',
        'sec_per_image': round(elapsed / b, 4),
        'batch': b,
    }))


if __name__ == '__main__':
    main()
