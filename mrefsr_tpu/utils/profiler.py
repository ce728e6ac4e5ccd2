"""First-class TPU profiling for training runs.

The reference's only instrumentation is wall-clock AvgTimer windows
(basicsr/utils/logger.py:10-42); on TPU the useful signal is the XLA
op-level trace. ``StepProfiler`` wraps ``jax.profiler`` so any training
run can capture a trace window with two YAML keys:

    logger:
      profile_start_iter: 100   # first profiled iteration
      profile_num_steps: 5      # how many steps to capture

Traces land in ``<experiment>/tb_logger/plugins/profile`` (viewable in
TensorBoard's profile tab or parsable from the .trace.json.gz).
"""
import os.path as osp

import jax

from .logger import get_root_logger


class StepProfiler:
    """Captures one jax.profiler trace window during the train loop.

    Call ``maybe_start(current_iter)`` at the top of each iteration and
    ``maybe_stop(current_iter)`` after the step; both are no-ops outside
    the configured window.
    """

    def __init__(self, opt):
        logger_opt = opt.get('logger') or {}
        self.start_iter = logger_opt.get('profile_start_iter')
        self.num_steps = logger_opt.get('profile_num_steps', 5)
        root = (opt.get('path') or {}).get('experiments_root', '.')
        self.trace_dir = logger_opt.get(
            'profile_dir', osp.join(root, 'tb_logger'))
        self._active = False
        self._done = False

    @property
    def enabled(self):
        return self.start_iter is not None

    def maybe_start(self, current_iter):
        if not self.enabled or self._active or self._done:
            return
        # >= not ==: in wave mode (steps_per_dispatch) current_iter
        # advances K at a time and may never land on start_iter exactly
        if current_iter >= self.start_iter:
            get_root_logger().info(
                f'Starting jax.profiler trace at iter {current_iter} '
                f'({self.num_steps} steps) -> {self.trace_dir}')
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def maybe_stop(self, current_iter):
        if not self._active:
            return
        if current_iter >= self.start_iter + self.num_steps - 1:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            get_root_logger().info(
                f'Saved jax.profiler trace to {self.trace_dir}')

    def close(self):
        """Finalize a window still open when the train loop exits (e.g.
        start_iter near total_iters) — otherwise the trace file is
        never written."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            get_root_logger().info(
                f'Saved jax.profiler trace to {self.trace_dir}')


def trace_annotation(name):
    """Context manager annotating a host-side region in the trace
    (shows up alongside device ops)."""
    return jax.profiler.TraceAnnotation(name)
