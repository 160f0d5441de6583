"""temporalstereo_tpu — a TPU-native spatio-temporal stereo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
youmi-zym/TemporalStereo (IROS 2023): coarse-to-fine sparse cost-volume stereo
matching over video with pose-guided temporal state propagation, scaled over
TPU meshes via pjit data parallelism.
"""

__version__ = "0.1.0"

from . import config, ops  # noqa: F401

__all__ = ["config", "ops", "__version__"]
