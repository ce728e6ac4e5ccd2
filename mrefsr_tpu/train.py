"""Generic training pipeline.

Rebuild of reference basicsr/train.py:17-215: parse options, auto-resume,
experiment dirs + loggers, dataloaders, model, prefetcher, then the
epoch/iter loop driving only the BaseModel interface. TPU notes: one
controller process drives all local chips, so the per-host loader batch
is batch_size_per_gpu x n_devices (replacing one-process-per-GPU DDP).
"""
import datetime
import logging
import math
import os
import signal
import time
from os import path as osp

from mrefsr_tpu.data import (CPUPrefetcher, DevicePrefetcher,
                             EnlargedSampler, build_dataloader,
                             build_dataset)
from mrefsr_tpu.models import build_model
from mrefsr_tpu.utils import (AvgTimer, MessageLogger, check_resume,
                              copy_opt_file, get_env_info, get_root_logger,
                              get_time_str, init_tb_logger,
                              init_wandb_logger, make_exp_dirs, mkdir_and_rename,
                              parse_options, scandir)


def init_tb_loggers(opt):
    """(reference train.py:17-26)"""
    if (opt['logger'].get('wandb') is not None
            and opt['logger']['wandb'].get('project') is not None
            and 'debug' not in opt['name']):
        assert opt['logger'].get('use_tb_logger') is True, (
            'should turn on tensorboard when using wandb')
        init_wandb_logger(opt)
    tb_logger = None
    if opt['logger'].get('use_tb_logger') and 'debug' not in opt['name']:
        tb_logger = init_tb_logger(
            log_dir=osp.join(opt['root_path'], 'tb_logger', opt['name']))
    return tb_logger


def create_train_val_dataloader(opt, logger):
    """(reference train.py:29-65)"""
    import jax
    n_devices = opt.get('num_gpu') or jax.local_device_count()
    train_loader, val_loaders = None, []
    for phase, dataset_opt in opt['datasets'].items():
        if phase == 'train':
            dataset_enlarge_ratio = dataset_opt.get(
                'dataset_enlarge_ratio', 1)
            train_set = build_dataset(dataset_opt)
            train_sampler = EnlargedSampler(train_set, opt['world_size'],
                                            opt['rank'],
                                            dataset_enlarge_ratio)
            # one controller drives n_devices chips: scale the loader batch
            dataset_opt = dict(dataset_opt)
            per_chip = dataset_opt['batch_size_per_gpu']
            dataset_opt['batch_size_per_gpu'] = per_chip * n_devices
            train_loader = build_dataloader(
                train_set, dataset_opt, num_gpu=n_devices,
                dist=opt['dist'], sampler=train_sampler,
                seed=opt['manual_seed'])

            num_iter_per_epoch = math.ceil(
                len(train_sampler) /
                (per_chip * n_devices))
            total_iters = int(opt['train']['total_iter'])
            total_epochs = math.ceil(total_iters / num_iter_per_epoch)
            logger.info(
                'Training statistics:'
                f'\n\tNumber of train images: {len(train_set)}'
                f'\n\tDataset enlarge ratio: {dataset_enlarge_ratio}'
                f'\n\tBatch size per chip: {per_chip}'
                f'\n\tDevices: {n_devices}'
                f'\n\tWorld size (hosts): {opt["world_size"]}'
                f'\n\tRequire iter number per epoch: {num_iter_per_epoch}'
                f'\n\tTotal epochs: {total_epochs}; '
                f'iters: {total_iters}.')
        elif phase.split('_')[0] in ('val', 'test'):
            val_set = build_dataset(dataset_opt)
            val_loader = build_dataloader(val_set, dataset_opt,
                                          num_gpu=n_devices,
                                          dist=opt['dist'])
            logger.info(f'Number of val images/folders in '
                        f'{dataset_opt["name"]}: {len(val_set)}')
            val_loaders.append(val_loader)
        else:
            raise ValueError(f'Dataset phase {phase} is not recognized.')

    return train_loader, train_sampler, val_loaders, total_epochs, \
        total_iters


def load_resume_state(opt):
    """Auto-resume from the newest .state (reference train.py:68-88)."""
    resume_state_path = None
    if opt['auto_resume']:
        # the derived experiment path, NOT a cwd-relative
        # 'experiments/<name>' (the reference hardcodes the latter,
        # train.py:70-71, which silently restarts-and-archives the run
        # under a custom experiments_root or a different cwd)
        state_path = opt['path']['training_states']
        if osp.isdir(state_path):
            states = list(scandir(state_path, suffix='.state',
                                  recursive=False, full_path=False))
            if len(states) != 0:
                states = [float(v.split('.state')[0]) for v in states]
                resume_state_path = osp.join(state_path,
                                             f'{max(states):.0f}.state')
                opt['path']['resume_state'] = resume_state_path
    else:
        if opt['path'].get('resume_state'):
            resume_state_path = opt['path']['resume_state']

    if resume_state_path is None:
        return None
    import pickle
    with open(resume_state_path, 'rb') as f:
        resume_state = pickle.load(f)
    check_resume(opt, resume_state['iter'])
    return resume_state


def _install_preemption_handler():
    """Graceful stop on SIGTERM/SIGINT: finish the in-flight step or
    wave, save a resumable .state checkpoint, exit 0.

    TPU pools preempt workers with SIGTERM (and schedulers send it on
    deadline); the reference has no counterpart — a kill mid-run loses
    everything since the last save_checkpoint_freq boundary, and a
    client killed mid-device-op can wedge a shared device tunnel. The
    first signal only sets a flag (the train loop checks it between
    dispatches, when no device op is in flight); a second signal
    restores the default disposition and re-raises, so a stuck run can
    still be killed hard. In multi-process training every rank must
    receive the signal (process launchers forward it); `model.save`
    itself is rank-0-gated. Returns an inert flag when not on the main
    thread (library embedding)."""
    state = {'stop': False}

    def handler(signum, frame):
        if state['stop']:
            signal.signal(signum, signal.SIG_DFL)
            os.kill(os.getpid(), signum)
            return
        state['stop'] = True

    try:
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, handler)
    except ValueError:
        pass  # not the main thread: leave dispositions alone
    return state


def train_pipeline(root_path, args=None):
    """(reference train.py:91-210)"""
    opt, cli_args = parse_options(root_path, is_train=True, args=args)
    opt['root_path'] = root_path

    # Persistent XLA compile cache (compile_cache: <dir>, or the
    # MREFSR_COMPILE_CACHE env var; 'none' disables). The stage3 scan
    # compile costs minutes per shape — production restarts and
    # multi-config sweeps shouldn't pay it twice.
    import jax
    cache_dir = os.environ.get(
        'MREFSR_COMPILE_CACHE',
        opt.get('compile_cache',
                # default ON for real accelerators only: CPU runs (the
                # test suite, dryruns) would pollute the committed
                # cache with host-compiled entries
                osp.join(root_path, '.jax_cache')
                if jax.default_backend() != 'cpu' else None))
    if cache_dir and str(cache_dir).lower() != 'none':
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          5.0)

    resume_state = load_resume_state(opt)
    if resume_state is None:
        make_exp_dirs(opt)
        if (opt['logger'].get('use_tb_logger')
                and 'debug' not in opt['name'] and opt['rank'] == 0):
            mkdir_and_rename(
                osp.join(opt['root_path'], 'tb_logger', opt['name']))

    copy_opt_file(cli_args.opt, opt['path']['experiments_root'])

    log_file = osp.join(opt['path']['log'],
                        f"train_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    from mrefsr_tpu.utils.options import dict2str
    logger.info(dict2str(opt))
    tb_logger = init_tb_loggers(opt)

    result = create_train_val_dataloader(opt, logger)
    train_loader, train_sampler, val_loaders, total_epochs, total_iters = \
        result

    model = build_model(opt)
    if resume_state:
        model.resume_training(resume_state)
        logger.info(f"Resuming training from epoch: "
                    f"{resume_state['epoch']}, iter: "
                    f"{resume_state['iter']}.")
        start_epoch = resume_state['epoch']
        current_iter = resume_state['iter']
    else:
        start_epoch = 0
        current_iter = 0

    msg_logger = MessageLogger(opt, current_iter, tb_logger)

    # prefetcher (reference train.py:136-150). 'device' is the
    # production path: H2D on its own thread (overlaps compute even
    # when transfers block their caller) + on-device uint8 -> f32
    # conversion for output_dtype: uint8 datasets.
    prefetch_mode = opt['datasets']['train'].get('prefetch_mode')
    if prefetch_mode is None or prefetch_mode == 'cpu':
        prefetcher = CPUPrefetcher(train_loader)
    elif prefetch_mode == 'device':
        from mrefsr_tpu.data import BackgroundDevicePrefetcher
        from mrefsr_tpu.parallel import batch_sharding
        prefetcher = BackgroundDevicePrefetcher(
            train_loader, opt, sharding=batch_sharding(model.mesh),
            device_keys=getattr(model, 'device_input_keys', None),
            depth=opt['datasets']['train'].get('prefetch_depth'))
        logger.info(f'Use {prefetch_mode} prefetch dataloader.')
    else:
        prefetcher = DevicePrefetcher(train_loader, opt)
        logger.info(f'Use {prefetch_mode} prefetch dataloader.')

    logger.info(f'Start training from epoch: {start_epoch}, '
                f'iter: {current_iter}')
    data_timer, iter_timer = AvgTimer(), AvgTimer()
    from mrefsr_tpu.utils.profiler import StepProfiler
    profiler = StepProfiler(opt)
    start_time = time.time()

    # steps_per_dispatch > 1 fuses K optimizer steps into one jitted
    # lax.scan dispatch (see optimize_parameters_wave) — the standard
    # TPU multi-step training dispatch. Logging/ckpt/val frequencies
    # then fire when a wave CROSSES a multiple of the frequency.
    wave_k = int(opt['train'].get('steps_per_dispatch') or 1)
    use_wave = wave_k > 1 and hasattr(model, 'optimize_parameters_wave')
    if use_wave:
        logger.info(f'Fusing {wave_k} steps per device dispatch.')

    def crossed(freq, lo, hi):
        """A multiple of freq lies in (lo, hi]."""
        return hi // int(freq) > lo // int(freq)

    preempt = _install_preemption_handler()
    epoch = start_epoch
    while current_iter < total_iters:
        train_sampler.set_epoch(epoch)
        prefetcher.reset()
        train_data = prefetcher.next()

        while train_data is not None:
            if current_iter >= total_iters:
                break
            prev_iter = current_iter
            if use_wave:
                batches = [train_data]
                while (len(batches) < wave_k and
                       current_iter + len(batches) < total_iters):
                    nxt = prefetcher.next()
                    if nxt is None:
                        break
                    batches.append(nxt)
                # ONE record covering all K fetches: the loader wait for
                # batches 2..K is data time, not compute time (the log
                # divides by the wave length, like iter_timer)
                data_timer.record()
                current_iter += len(batches)
                model.update_learning_rate(
                    current_iter,
                    warmup_iter=opt['train'].get('warmup_iter', -1))
                profiler.maybe_start(current_iter)
                model.optimize_parameters_wave(batches, prev_iter + 1)
                profiler.maybe_stop(current_iter)
            else:
                data_timer.record()
                current_iter += 1
                model.update_learning_rate(
                    current_iter,
                    warmup_iter=opt['train'].get('warmup_iter', -1))
                profiler.maybe_start(current_iter)
                model.feed_data(train_data)
                model.optimize_parameters(current_iter)
                profiler.maybe_stop(current_iter)
            iter_timer.record()
            if prev_iter == 0:
                msg_logger.reset_start_time()
            if crossed(opt['logger']['print_freq'], prev_iter,
                       current_iter):
                # one timer record covers the whole wave — report
                # PER-ITER times so logs compare across dispatch modes
                steps = max(current_iter - prev_iter, 1)
                log_vars = {'epoch': epoch, 'iter': current_iter}
                log_vars.update(
                    {'lrs': model.get_current_learning_rate()})
                log_vars.update(
                    {'time': iter_timer.get_avg_time() / steps,
                     'data_time': data_timer.get_avg_time() / steps})
                log_vars.update(model.get_current_log())
                msg_logger(log_vars)

            if crossed(opt['logger']['save_checkpoint_freq'], prev_iter,
                       current_iter):
                logger.info('Saving models and training states.')
                model.save(epoch, current_iter)

            if opt.get('val') is not None and crossed(
                    opt['val']['val_freq'], prev_iter, current_iter):
                for val_loader in val_loaders:
                    model.validation(val_loader, current_iter, tb_logger,
                                     opt['val'].get('save_img', False))

            if preempt['stop']:
                break
            data_timer.start()
            iter_timer.start()
            train_data = prefetcher.next()
        if preempt['stop']:
            # graceful preemption: the dispatched work is done (save
            # blocks on the params), state is resumable via
            # --auto_resume, exit code 0 so supervisors see a clean stop
            profiler.close()
            logger.info(f'Preemption signal received: saving state at '
                        f'iter {current_iter} and stopping cleanly.')
            model.save(epoch, current_iter)
            if tb_logger:
                tb_logger.close()
            return model
        epoch += 1

    profiler.close()  # finalize a window still open past total_iters
    consumed_time = str(
        datetime.timedelta(seconds=int(time.time() - start_time)))
    logger.info(f'End of training. Time consumed: {consumed_time}')
    logger.info('Save the latest model.')
    model.save(epoch=-1, current_iter=-1)  # -1 for the latest
    if opt.get('val') is not None:
        for val_loader in val_loaders:
            model.validation(val_loader, current_iter, tb_logger,
                             opt['val'].get('save_img', False))
    if tb_logger:
        tb_logger.close()
    return model


if __name__ == '__main__':
    root_path = osp.abspath(osp.join(__file__, osp.pardir, osp.pardir))
    train_pipeline(root_path)
