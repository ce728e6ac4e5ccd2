"""mrefsr_tpu — TPU-native multi-reference super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of wdmwhh/MRefSR
(a BasicSR-derived PyTorch toolbox). Keeps the reference's public surface —
YAML-driven experiments, train/test pipelines, string-keyed registries,
.pth checkpoint import — with TPU-first internals: NHWC flax networks, a
single jitted data-parallel train step sharded over a device mesh, vmapped
5-reference processing, and Pallas kernels for deformable convolution and
dense patch-correlation matching.
"""
from .utils import *  # noqa: F401,F403
from .version import __version__  # noqa: F401
