"""North-star benchmark: LMR 5-ref x4 SR training throughput per chip.

Measures the full stage3_5ref_restoration_mse training step (contrastive
VGG16 extraction on input + 5 refs, dense patch matching + offset
expansion, VGG19 ref features, MRAPA restoration with deformable
aggregation, L1 loss, Adam update with 4 LR groups) at the reference's
gt_size=160 on however many chips are attached, and reports
images/sec/chip.

vs_baseline follows BASELINE.json's north star — "a single v5e-8
exceeding the reference's 4-GPU stage3 training throughput":
vs_baseline = (imgs/sec/chip x 8 chips) / (4 GPUs x derived per-GPU
rate). The reference publishes no throughput numbers (BASELINE.md —
"published": {}) and no GPU exists here to measure one, so the per-GPU
denominator is DERIVED (baseline_basis: "derived", full math in
BASELINE.md "Derived reference throughput"):

    per-GPU rate = achieved V100 f32 training TF/s
                   / step TFLOP per image
                 = 9.8 / 0.995  =  9.85 img/s/GPU

* step cost 0.995 TFLOP/image: MEASURED via XLA cost_analysis over the
  full stage3 train step at gt=160 (scripts/benchmarks/count_flops.py
  — same networks, same algebra as the reference's torch graph).
* 9.8 TF/s: public achieved rate for f32 conv-net TRAINING on V100
  (ResNet-50 ~400 img/s x 24.6 GFLOP/img ~ 62% of 15.7 TF/s peak).
  GENEROUS to the reference: it assumes the whole step (including the
  memory-bound mmcv DCN im2col and the chunked correlation, and the
  host loader / DDP overheads) runs at clean-conv efficiency.
* V100-f32 is the modeled hardware: 2023 BasicSR-lineage paper, no AMP
  anywhere in the reference configs. BASELINE.md carries an A100-TF32
  sensitivity row.

The JSON still carries ``baseline_estimated: true`` plus every
derivation input so the figure is machine-readably honest; replace
with a measured reference number when one exists.

Driver-robustness design (each a round-1 failure mode):
  * persistent compilation cache in ``<repo>/.jax_cache`` — committed,
    so the next round's driver run warm-starts the (minutes-long on a
    cold cache) full-graph compile;
  * ONE compiled graph (the N-step scan), not two;
  * heartbeat lines on stderr so a watching driver sees progress;
  * a fail-fast device probe with a hard timeout (the axon tunnel can
    hang on connect or die with a libtpu version mismatch) and a
    deadline watchdog — both emit a JSON-parseable error line on
    stdout instead of dying silently.

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "baseline_estimated", ...}.
The line's ``production`` field embeds the previously-measured
production-path rates (flow alignment, lp, GAN wave, serving) parsed
from the committed BENCH_*.json side artifacts, each with both
baseline bases — the headline value stays the reference-parity DCN
path; see _production_summary.
"""
import json
import os
import sys
import threading
import time

import numpy as np

# Derived reference baseline (see module docstring + BASELINE.md):
# step TFLOP/image MEASURED via count_flops.py per gt_size (the lp
# large-patch config trains at gt=300; correlation FLOPs scale with
# area^2, convs with area, so the ratio is not a simple square)
REF_STEP_TFLOP_PER_IMAGE_BY_GT = {160: 0.995, 300: 3.570}
REF_STEP_TFLOP_PER_IMAGE = REF_STEP_TFLOP_PER_IMAGE_BY_GT[160]
# one WGAN-GP phase iteration (D update incl. GP double-backward + G
# update, net_d_steps=1) — count_flops.py --phase gan; BASELINE.md
# "GAN wave" derivation
REF_GAN_STEP_TFLOP_PER_IMAGE_BY_GT = {160: 1.301}
REF_GPU_ACHIEVED_TFLOPS = 9.8      # V100 f32 conv-training achieved
REF_IMGS_PER_SEC_PER_GPU = round(
    REF_GPU_ACHIEVED_TFLOPS / REF_STEP_TFLOP_PER_IMAGE, 2)  # 9.85
REF_NUM_GPUS = 4
TARGET_NUM_CHIPS = 8  # one v5e-8 host
# A100-TF32 sensitivity basis (BASELINE.md "Sensitivity (A100)"):
# ~2.5x the V100-f32 achieved rate. Emitted alongside the V100 basis
# so either reading is recomputable from the one JSON line.
A100_OVER_V100 = 2.5

METRIC = 'lmr_5ref_x4_train_imgs_per_sec_per_chip'
UNIT = 'images/sec/chip'
_T0 = time.time()


def _hb(msg):
    """Heartbeat to stderr (stdout is reserved for the one JSON line)."""
    print(f'[bench +{time.time() - _T0:7.1f}s] {msg}', file=sys.stderr,
          flush=True)


def _emit(value, vs_baseline, extra=None):
    result = {
        'metric': METRIC,
        'value': value,
        'unit': UNIT,
        'vs_baseline': vs_baseline,
        'baseline_estimated': True,
        'baseline_basis': 'derived',
        # per-run baseline_imgs_per_sec_per_gpu / step_tflop fields are
        # set by the caller ONLY when they describe the measured run
        # (pixel phase at a gt with a measured FLOP count) — a GAN or
        # unlisted-gt record must not carry the gt=160 pixel constants
        'baseline_gpu_achieved_tflops': REF_GPU_ACHIEVED_TFLOPS,
        'baseline_gpu_model': 'V100-f32 (see BASELINE.md)',
    }
    if extra:
        result.update(extra)
    print(json.dumps(result), flush=True)


def _fail(msg, code=1):
    _hb(f'FAIL: {msg}')
    _emit(None, None, {'error': msg})
    # os._exit: the failure modes this guards (hung tunnel threads,
    # wedged TPU client) can block a normal interpreter shutdown.
    sys.stderr.flush()
    os._exit(code)


def _start_watchdog():
    """Guarantee a JSON line even if the run wedges: after BENCH_DEADLINE
    seconds (default 20 min), emit an error record and exit."""
    deadline = float(os.environ.get('BENCH_DEADLINE', '1200'))

    def _expire():
        _fail(f'deadline watchdog fired after {deadline:.0f}s '
              f'(compile or device dispatch wedged)', code=3)

    t = threading.Timer(deadline, _expire)
    t.daemon = True
    t.start()
    return t


def _probe_retry_or_fail(msg):
    """A wedged backend init can't be retried in-process (the jax
    runtime is already stuck): exit code 4 so the supervisor parent
    (which never imports jax — see _supervise) can retry in a FRESH
    process. NOT os.execv: the wedged tunnel socket has no CLOEXEC and
    would survive into the re-exec'd image, wedging every retry (and
    holding the tunnel server hostage — observed). The child stays
    silent on stdout when BENCH_SILENT_PROBE_FAIL is set so the driver
    sees exactly one JSON line overall."""
    _hb(f'FAIL(probe): {msg}')
    if not os.environ.get('BENCH_SILENT_PROBE_FAIL'):
        _emit(None, None, {'error': msg})
    sys.stderr.flush()
    os._exit(4)


def _supervise():
    """Parent mode: spawn the real bench as a child process and retry
    probe-timeouts (exit code 4) with a fresh child. The parent never
    imports jax, so it can't wedge and holds no tunnel state. SIGTERM/
    SIGINT forward to the live child so a driver-side `timeout` kill
    can't orphan a grandchild that keeps the tunnel wedged."""
    import signal
    import subprocess
    child = [None]

    def _forward(signum, _frame):
        if child[0] is not None and child[0].poll() is None:
            child[0].send_signal(signum)
            try:
                child[0].wait(timeout=10)
            except subprocess.TimeoutExpired:
                child[0].kill()
        os._exit(128 + signum)

    signal.signal(signal.SIGTERM, _forward)
    signal.signal(signal.SIGINT, _forward)

    retries = int(os.environ.get('BENCH_PROBE_RETRIES', '2'))
    for attempt in range(retries + 1):
        env = dict(os.environ, BENCH_CHILD='1')
        if attempt < retries:
            env['BENCH_SILENT_PROBE_FAIL'] = '1'
        else:
            env.pop('BENCH_SILENT_PROBE_FAIL', None)
        _hb(f'supervisor: bench attempt {attempt + 1}/{retries + 1}')
        child[0] = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env)
        rc = child[0].wait()
        if rc != 4:
            sys.exit(rc)
        if attempt < retries:
            _hb('probe failed in child (rc=4); fresh process in 20s')
            time.sleep(20)
    sys.exit(4)


def _probe_devices_start():
    """Kick off backend init + one tiny op on a daemon thread.

    The axon tunnel's first connect can take minutes or hang outright,
    and a libtpu client/terminal version mismatch kills the first
    dispatch — probe in a daemon thread so we can fail fast either way.
    Returning immediately lets the caller overlap its own heavy imports
    (torch/flax/optax ~10 s) and host-side setup under the tunnel
    connect, which dominated the round-2 driver run (141 s of probe).
    """
    state = {}

    def _probe():
        try:
            import jax
            import jax.numpy as jnp
            state['backend'] = jax.default_backend()
            state['n_devices'] = jax.local_device_count()
            x = jnp.ones((128, 128), jnp.float32)
            y = (x @ x).block_until_ready()
            state['ok'] = bool(float(y[0, 0]) == 128.0)
        except Exception as e:  # noqa: BLE001 — reported via _fail
            state['error'] = f'{type(e).__name__}: {e}'

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    return state, th


def _probe_devices_join(state, th, timeout_s):
    th.join(timeout_s)
    if th.is_alive():
        _probe_retry_or_fail(
            f'device probe did not complete within {timeout_s:.0f}s '
            '(tunnel hang?)')
    if 'error' in state:
        # deterministic failure (e.g. libtpu version mismatch raises
        # immediately) — retrying fresh processes only delays the one
        # JSON error line the driver is waiting for
        _fail(f'device probe failed: {state["error"]}')
    if not state.get('ok'):
        _fail('device probe returned wrong matmul result')
    return state['backend'], state['n_devices']


def main():
    _start_watchdog()
    repo = os.path.dirname(os.path.abspath(__file__))

    import jax
    # Persistent compilation cache: survives across rounds (the dir is
    # committed), so the driver's run warm-starts the full-graph compile.
    cache_dir = os.environ.get('BENCH_COMPILE_CACHE',
                               os.path.join(repo, '.jax_cache'))
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    _hb('probing devices (backend init + tiny matmul)...')
    # 240s per attempt: the healthy tunnel connects in seconds, and a
    # shorter timeout leaves room for the re-exec retries (the hang mode
    # is transient — a fresh process right after usually connects)
    probe_state, probe_th = _probe_devices_start()

    # overlap the framework imports (torch/flax/optax, ~10 s) under the
    # tunnel connect — they don't touch devices
    import jax.numpy as jnp
    from mrefsr_tpu.models import build_model

    backend, n_devices = _probe_devices_join(
        probe_state, probe_th,
        float(os.environ.get('BENCH_PROBE_TIMEOUT', '240')))
    _hb(f'backend={backend} devices={n_devices} cache={cache_dir}')

    # 8/chip is the measured throughput sweet spot on a 16 GB v5e chip
    # (default = single-remat DCN backward + fusion residuals kept:
    # b8 10.21; with fusion_remat: b4 9.05, b8 9.97; with
    # dcn_outer_remat too: b4 8.76, b6 8.37, b8 9.44, b12 8.91)
    per_chip_batch = int(os.environ.get('BENCH_BATCH', '8'))
    gt = int(os.environ.get('BENCH_GT_SIZE', '160'))
    # 'pix' (default, the driver metric) or 'gan': the WGAN-GP phase
    # wave (D step every iter + G step on its alternation schedule)
    phase = os.environ.get('BENCH_PHASE', 'pix')
    if phase not in ('pix', 'gan'):
        _fail(f"BENCH_PHASE must be 'pix' or 'gan', got {phase!r}")
    t = 5
    b = per_chip_batch * n_devices

    opt = {
        'name': 'bench', 'model_type': 'MultiRefRestorationModel',
        'scale': 4, 'crop_border': 4, 'num_gpu': n_devices,
        'manual_seed': 0, 'is_train': True, 'dist': False, 'rank': 0,
        'world_size': 1,
        'network_g': {'type': 'MRAPARestorationNet', 'ngf': 64,
                      'n_blocks': 16, 'groups': 8,
                      'ref_unroll': int(os.environ.get(
                          'BENCH_REF_UNROLL', '1')),
                      # the lp (gt=300) config needs the heavier remat
                      # policy to fit HBM: BENCH_GT_SIZE=300
                      # BENCH_DCN_OUTER_REMAT=1 BENCH_FUSION_REMAT=1
                      'dcn_outer_remat': bool(int(os.environ.get(
                          'BENCH_DCN_OUTER_REMAT', '0'))),
                      'fusion_remat': bool(int(os.environ.get(
                          'BENCH_FUSION_REMAT', '0'))),
                      # 'flow' measures the opt-in flow-warp fast
                      # alignment (FlowAgg) instead of the reference-
                      # compatible DCN alignment; the driver metric
                      # stays 'dcn'
                      'alignment': os.environ.get('BENCH_ALIGNMENT',
                                                  'dcn')},
        'network_map': {'type': 'CorrespondenceGenerationArch',
                        'patch_size': 3, 'stride': 1,
                        'vgg_layer_list': ['relu1_1', 'relu2_1',
                                           'relu3_1'],
                        'vgg_type': 'vgg19'},
        'network_extractor': {'type': 'ContrasMultiExtractorSep'},
        'path': {},
        'train': {
            'lr_g': 1e-4, 'lr_offset': 1e-4, 'lr_relu3_offset': 1e-6,
            'lr_relu2_offset': 1e-5, 'weight_decay_g': 0,
            'beta_g': [0.9, 0.999],
            'scheduler': {'type': 'MultiStepLR',
                          'milestones': [300000, 400000], 'gamma': 0.5},
            'total_iter': 100, 'warmup_iter': -1,
            'net_g_pretrain_steps': 0,
            'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
            'mixed_precision': os.environ.get('BENCH_MP', 'bfloat16') or None,
        },
    }
    if phase == 'gan':
        # stage3 GAN-phase shape: SRNTT ImageDiscriminator + WGAN-GP
        # (reference multi_ref_restoration_model.py:197-279)
        opt['network_d'] = {'type': 'ImageDiscriminator', 'in_nc': 3,
                            'ndf': 32}
        opt['train'].update({
            'lr_d': 1e-4, 'weight_decay_d': 0, 'beta_d': [0.9, 0.999],
            'gan_type': 'wgan', 'gan_weight': 1e-5,
            'grad_penalty_weight': 10.0, 'net_g_pretrain_steps': 0,
        })
    _hb('building model...')
    model = build_model(opt)

    rng = np.random.RandomState(0)
    batch = {
        'img_in': rng.rand(b, gt, gt, 3).astype(np.float32),
        'img_in_lq': rng.rand(b, gt // 4, gt // 4, 3).astype(np.float32),
        'img_in_up': rng.rand(b, gt, gt, 3).astype(np.float32),
        'img_ref_list': rng.rand(b, t, gt, gt, 3).astype(np.float32),
    }

    # init params (lazy, shape-driven) and build the step WITHOUT
    # compiling the single-step jit — only the scanned variant below is
    # compiled (each full-graph compile costs minutes on a cold cache)
    _hb(f'initializing params (b={b}, gt={gt}, t={t}, phase={phase})...')
    model.feed_data(batch)
    if phase == 'gan':
        model._train_step_gan = model._build_train_step_gan()
    else:
        model._train_step_pix = model._build_train_step_pix()

    # measure N real optimizer steps fused into ONE dispatch: a jitted
    # lax.scan threads (params, opt state, iter) through the steps, the
    # standard TPU multi-step training dispatch (it also keeps host /
    # tunnel round-trip latency out of the measurement). Inputs are
    # device-resident — in production the async prefetcher
    # double-buffers H2D copies behind the step.
    from mrefsr_tpu.parallel import batch_sharding
    sharding = batch_sharding(model.mesh)
    match_img_in = jax.device_put(model.match_img_in, sharding)
    refs = jax.device_put(model.img_ref_list, sharding)
    lq = jax.device_put(model.img_in_lq, sharding)
    gt_dev = jax.device_put(model.gt, sharding)
    n_steps = max(2, int(os.environ.get('BENCH_STEPS', '16')))

    if phase == 'gan':
        # the GAN wave exactly as _optimize_gan_wave scans it: D every
        # step, G on the alternation schedule, host-drawn rng keys
        raw_gan = model._train_step_gan_raw
        d_steps = model.net_d_steps
        init_steps = model.net_d_init_steps
        rngs = jnp.stack([model.next_rng() for _ in range(n_steps)])

        def run_steps(length):
            @jax.jit
            def run(vars_g, vars_d, opt_g, opt_d, vars_ex, vars_map,
                    mi, r, lq_, gt_, rngs_):
                def body(carry, xs):
                    vg, vd, og, od = carry
                    rng_, idx = xs
                    g_turn = jnp.logical_and(idx % d_steps == 0,
                                             idx > init_steps)
                    vg, vd, og, od, losses = raw_gan(
                        vg, vd, og, od, vars_ex, vars_map,
                        mi, r, lq_, gt_, rng_, g_turn)
                    return (vg, vd, og, od), losses['l_d_real']
                carry, l = jax.lax.scan(
                    body, (vars_g, vars_d, opt_g, opt_d),
                    (rngs_[:length], jnp.arange(3, 3 + length)))
                return l[-1]
            return run

        args = (model.vars_g, model.vars_d, model.opt_state_g,
                model.opt_state_d, model.vars_extractor, model.vars_map,
                match_img_in, refs, lq, gt_dev, rngs)
    else:
        raw_step = model._train_step_pix_raw

        def run_steps(length):
            @jax.jit
            def run(vars_g, opt_state, vars_ex, vars_map, mi, r, lq_,
                    gt_):
                def body(carry, idx):
                    vg, os_ = carry
                    vg, os_, losses = raw_step(vg, os_, vars_ex,
                                               vars_map, mi, r, lq_,
                                               gt_, idx)
                    return (vg, os_), losses['l_pix']
                (vg, os_), l = jax.lax.scan(
                    body, (vars_g, opt_state), jnp.arange(3, 3 + length))
                return l[-1]
            return run

        args = (model.vars_g, model.opt_state_g, model.vars_extractor,
                model.vars_map, match_img_in, refs, lq, gt_dev)
    run = run_steps(n_steps)

    _hb(f'compiling the {n_steps}-step fused scan '
        '(minutes on a cold compile cache)...')
    tc = time.perf_counter()
    # the final loss depends on every step's params; float() is a D2H
    # completion barrier even on runtimes whose block_until_ready
    # returns at dispatch time
    float(run(*args))
    t_compile = time.perf_counter() - tc
    _hb(f'compile+first-run done in {t_compile:.1f}s; timing...')

    best = float('inf')
    for rep in range(int(os.environ.get('BENCH_REPS', '2'))):
        start = time.perf_counter()
        float(run(*args))
        elapsed = time.perf_counter() - start
        best = min(best, elapsed)
        _hb(f'rep {rep}: {elapsed:.3f}s for {n_steps} steps '
            f'({b * n_steps / elapsed:.2f} img/s)')

    # one dispatch per n_steps optimizer steps: per-step dispatch
    # overhead is amortized ~n_steps-fold, so no second compiled graph
    # is needed to cancel it (round 1's two full compiles timed out
    # under the driver)
    imgs_per_sec = b * n_steps / best
    imgs_per_sec_chip = imgs_per_sec / n_devices
    # the derived per-GPU denominator models the measured phase's step
    # at the benched gt_size (FLOPs measured per size+phase —
    # count_flops.py; a gt without a measured count gets a null
    # vs_baseline rather than the wrong constants)
    ref_tflop = (REF_GAN_STEP_TFLOP_PER_IMAGE_BY_GT.get(gt)
                 if phase == 'gan'
                 else REF_STEP_TFLOP_PER_IMAGE_BY_GT.get(gt))
    vs_baseline = None
    extra = {'backend': backend, 'n_devices': n_devices,
             'per_chip_batch': per_chip_batch, 'gt_size': gt,
             'phase': phase,
             'alignment': opt['network_g']['alignment'],
             'n_steps_per_dispatch': n_steps,
             'compile_plus_first_run_s': round(t_compile, 1)}
    if ref_tflop is not None:
        ref_rate = REF_GPU_ACHIEVED_TFLOPS / ref_tflop
        vs_baseline = round(imgs_per_sec_chip * TARGET_NUM_CHIPS /
                            (ref_rate * REF_NUM_GPUS), 3)
        extra['baseline_imgs_per_sec_per_gpu'] = round(ref_rate, 2)
        extra['baseline_step_tflop_per_image'] = ref_tflop
        extra['vs_baseline_a100'] = round(vs_baseline / A100_OVER_V100,
                                          3)
    production = _production_summary(repo)
    if production:
        extra['production'] = production
    _emit(round(imgs_per_sec_chip, 3), vs_baseline, extra)


def _production_summary(repo):
    """Secondary, previously-measured production rates embedded in the
    driver's one JSON line (VERDICT r4 #2): the headline above is the
    reference-PARITY path (DCN alignment, the apples-to-apples number);
    the accuracy-validated PRODUCTION path (alignment: flow, shipped as
    options/train/stage3_5ref_restoration_mse_flow.yml) plus the lp /
    GAN / serving regimes live in committed side artifacts re-measured
    by their own bench invocations (commands in each artifact). Each
    entry carries both baseline bases (V100-f32 derived + A100-TF32
    sensitivity, BASELINE.md). Parsed, not re-measured, so the default
    driver run stays one compile."""
    side = {
        'flow_train': 'BENCH_FLOW.json',
        'lp_flow_train': 'BENCH_LP_FLOW.json',
        'lp_dcn_train': 'BENCH_LP.json',
        'gan_wave_dcn': 'BENCH_GAN.json',
        'gan_wave_flow': 'BENCH_GAN_FLOW.json',
        'serving_cufed5': 'BENCH_SERVING.json',
    }
    out = {}
    for name, fname in side.items():
        path = os.path.join(repo, fname)
        if not os.path.exists(path):
            continue
        try:
            with open(path) as f:
                rec = json.loads(f.read().strip().splitlines()[-1])
        except (ValueError, OSError):
            continue
        if rec.get('value') is None:
            continue
        entry = {'imgs_per_sec_per_chip': rec['value'],
                 'vs_baseline': rec.get('vs_baseline'),
                 'source': fname}
        if rec.get('vs_baseline') is not None:
            entry['vs_baseline_a100'] = round(
                rec['vs_baseline'] / A100_OVER_V100, 3)
        for k in ('cli_imgs_per_sec_per_chip', 'alignment', 'gt_size',
                  'phase', 'note', 'command'):
            if k in rec:
                entry[k] = rec[k]
        out[name] = entry
    return out


if __name__ == '__main__':
    if os.environ.get('BENCH_CHILD'):
        main()
    else:
        _supervise()
