from .color_util import (bgr2ycbcr, rgb2ycbcr, rgb2ycbcr_jax,
                         rgb2ycbcr_pt, ycbcr2bgr, ycbcr2rgb)
from .diffjpeg import DiffJPEG
from .dist_util import get_dist_info, init_dist, master_only
from .file_client import FileClient
from .img_process_util import USMSharp, filter2D, usm_sharp
from .img_util import (crop_border, imfrombytes, img2tensor, imwrite,
                       tensor2img, tensor2img_fast)
from .logger import (AvgTimer, MessageLogger, get_env_info, get_root_logger,
                     init_tb_logger, init_wandb_logger)
from .matlab_functions import imresize
from .misc import (check_resume, get_time_str, make_exp_dirs,
                   mkdir_and_rename, scandir, set_random_seed, sizeof_fmt)
from .options import copy_opt_file, dict2str, parse_options, yaml_load
from .registry import (ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY,
                       METRIC_REGISTRY, MODEL_REGISTRY, Registry)

# ProgressBar compatibility: a thin tqdm-style progress printer used by
# validation loops (reference basicsr/utils/misc.py:146-202).
import sys as _sys
import time as _time


class ProgressBar:
    """Minimal console progress bar matching the reference's usage:
    ``pbar = ProgressBar(total); pbar.update('msg')``."""

    def __init__(self, task_num=0, bar_width=50, start=True):
        self.task_num = task_num
        self.bar_width = bar_width
        self.completed = 0
        if start:
            self.start()

    def start(self):
        if self.task_num > 0:
            _sys.stdout.write(f'[{" " * self.bar_width}] 0/{self.task_num}, '
                              'elapsed: 0s, ETA:\nStart...\n')
        else:
            _sys.stdout.write('completed: 0, elapsed: 0s')
        _sys.stdout.flush()
        self.start_time = _time.time()

    def update(self, msg='In progress...'):
        self.completed += 1
        elapsed = _time.time() - self.start_time + 1e-8
        fps = self.completed / elapsed
        if self.task_num > 0:
            percentage = self.completed / float(self.task_num)
            eta = int(elapsed * (1 - percentage) / percentage + 0.5)
            mark_width = int(self.bar_width * percentage)
            bar_chars = '>' * mark_width + '-' * (self.bar_width - mark_width)
            _sys.stdout.write(
                f'\033[J[{bar_chars}] {self.completed}/{self.task_num}, '
                f'{fps:.1f} task/s, elapsed: {int(elapsed + 0.5)}s, '
                f'ETA: {eta:5}s\n{msg}\n')
        else:
            _sys.stdout.write(
                f'completed: {self.completed}, elapsed: {int(elapsed + 0.5)}s,'
                f' {fps:.1f} tasks/s')
        _sys.stdout.flush()


__all__ = [
    # color_util
    'bgr2ycbcr', 'rgb2ycbcr', 'rgb2ycbcr_jax', 'ycbcr2bgr', 'ycbcr2rgb',
    # diffjpeg / img_process_util
    'DiffJPEG', 'USMSharp', 'filter2D', 'usm_sharp',
    # dist_util
    'get_dist_info', 'init_dist', 'master_only',
    # file_client
    'FileClient',
    # img_util
    'crop_border', 'imfrombytes', 'img2tensor', 'imwrite', 'tensor2img',
    'tensor2img_fast',
    # logger
    'AvgTimer', 'MessageLogger', 'get_env_info', 'get_root_logger',
    'init_tb_logger', 'init_wandb_logger',
    # matlab_functions
    'imresize',
    # misc
    'check_resume', 'get_time_str', 'make_exp_dirs', 'mkdir_and_rename',
    'scandir', 'set_random_seed', 'sizeof_fmt', 'ProgressBar',
    # options
    'copy_opt_file', 'dict2str', 'parse_options', 'yaml_load',
    # registry
    'ARCH_REGISTRY', 'DATASET_REGISTRY', 'LOSS_REGISTRY', 'METRIC_REGISTRY',
    'MODEL_REGISTRY', 'Registry',
]
