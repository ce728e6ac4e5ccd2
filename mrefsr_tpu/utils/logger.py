"""Experiment logging: root logger, MessageLogger with ETA, tensorboard.

Rebuild of reference basicsr/utils/logger.py. Rank gating uses
``jax.process_index()`` instead of torch.distributed rank; env banner
reports jax/XLA versions and the device roster.
"""
import datetime
import logging
import os
import time

from .dist_util import get_dist_info, master_only

initialized_logger = {}


class AvgTimer:
    """Windowed average wall-clock timer (reference logger.py:10-42)."""

    def __init__(self, window=200):
        self.window = window
        self.current_time = 0
        self.total_time = 0
        self.count = 0
        self.avg_time = 0
        self.start()

    def start(self):
        self.start_time = self.tic = time.time()

    def record(self):
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        # reset
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self):
        return self.current_time

    def get_avg_time(self):
        return self.avg_time


class MessageLogger:
    """Format training-iteration log lines with ETA (reference
    logger.py:45-116): ``[name..][epoch, iter, lr] [eta, time (data)] l_*``.
    """

    def __init__(self, opt, start_iter=1, tb_logger=None):
        self.exp_name = opt['name']
        self.interval = opt['logger']['print_freq']
        self.start_iter = start_iter
        self.max_iters = opt['train']['total_iter']
        self.use_tb_logger = opt['logger'].get('use_tb_logger', False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self):
        self.start_time = time.time()

    @master_only
    def __call__(self, log_vars):
        epoch = log_vars.pop('epoch')
        current_iter = log_vars.pop('iter')
        lrs = log_vars.pop('lrs')

        message = (f'[{self.exp_name[:5]}..][epoch:{epoch:3d}, '
                   f'iter:{current_iter:8,d}, lr:(')
        for v in lrs:
            message += f'{v:.3e},'
        message += ')] '

        # time and estimated time
        if 'time' in log_vars.keys():
            iter_time = log_vars.pop('time')
            data_time = log_vars.pop('data_time')

            total_time = time.time() - self.start_time
            time_sec_avg = total_time / (current_iter - self.start_iter + 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f'[eta: {eta_str}, '
            message += f'time (data): {iter_time:.3f} ({data_time:.3f})] '

        # other items, especially losses
        for k, v in log_vars.items():
            message += f'{k}: {v:.4e} '
            # tensorboard logger
            if self.use_tb_logger and self.tb_logger is not None:
                label = f'losses/{k}' if k.startswith('l_') else k
                self.tb_logger.add_scalar(label, v, current_iter)
        self.logger.info(message)


@master_only
def init_tb_logger(log_dir):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        get_root_logger().warning(
            'tensorboard is not available; tb logging disabled.')
        return None
    return SummaryWriter(log_dir=log_dir)


@master_only
def init_wandb_logger(opt):
    """W&B sync shim (reference logger.py:126-143); gated on import."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning('wandb is not installed; skipped.')
        return
    logger = get_root_logger()
    project = opt['logger']['wandb']['project']
    resume_id = opt['logger']['wandb'].get('resume_id')
    if resume_id:
        wandb_id = resume_id
        resume = 'allow'
        logger.warning(f'Resume wandb logger with id={wandb_id}.')
    else:
        wandb_id = wandb.util.generate_id()
        resume = 'never'
    wandb.init(id=wandb_id, resume=resume, name=opt['name'],
               config=opt, project=project, sync_tensorboard=True)
    logger.info(f'Use wandb logger with id={wandb_id}; project={project}.')


def get_root_logger(logger_name='mrefsr_tpu', log_level=logging.INFO,
                    log_file=None):
    """Process-aware root logger (reference logger.py:146-185): stream
    handler everywhere; file handler + INFO level only on process 0, other
    processes log at ERROR."""
    logger = logging.getLogger(logger_name)
    if logger_name in initialized_logger:
        # a later pipeline run in the same process may pass a NEW
        # log_file (the reference's name-keyed cache silently appends
        # run 2's lines to run 1's file and never creates run 2's log):
        # redirect the file handler to the new path on rank 0
        rank, _ = get_dist_info()
        if log_file is not None and rank == 0 and not any(
                isinstance(h, logging.FileHandler)
                and h.baseFilename == os.path.abspath(log_file)
                for h in logger.handlers):
            for h in [h for h in logger.handlers
                      if isinstance(h, logging.FileHandler)]:
                logger.removeHandler(h)
                h.close()
            file_handler = logging.FileHandler(log_file, 'w')
            file_handler.setFormatter(logging.Formatter(
                '%(asctime)s %(levelname)s: %(message)s'))
            file_handler.setLevel(log_level)
            logger.addHandler(file_handler)
        return logger

    format_str = '%(asctime)s %(levelname)s: %(message)s'
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter(format_str))
    logger.addHandler(stream_handler)
    logger.propagate = False
    rank, _ = get_dist_info()
    if rank != 0:
        logger.setLevel('ERROR')
    elif log_file is not None:
        logger.setLevel(log_level)
        file_handler = logging.FileHandler(log_file, 'w')
        file_handler.setFormatter(logging.Formatter(format_str))
        file_handler.setLevel(log_level)
        logger.addHandler(file_handler)
    else:
        logger.setLevel(log_level)
    initialized_logger[logger_name] = True
    return logger


def get_env_info():
    """Environment banner (reference logger.py:188-213), jax edition."""
    import jax
    from mrefsr_tpu.version import __version__
    try:
        devices = jax.devices()
        device_str = f'{len(devices)} x {devices[0].device_kind}'
    except Exception:
        device_str = 'unknown'
    msg = ('\nFramework: mrefsr_tpu'
           f'\n\tVersion: {__version__}'
           f'\n\tJAX: {jax.__version__}'
           f'\n\tBackend: {jax.default_backend()}'
           f'\n\tDevices: {device_str}'
           f'\n\tProcesses: {jax.process_count()}')
    return msg
