"""Achelous-TPU: TPU-native vision-radar panoptic perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
GuanRunwei/Achelous (water-surface 5-task perception from monocular camera +
4D mmWave radar), designed TPU-first: NHWC layouts, static shapes, fused
kernels, SPMD sharding over device meshes.
"""
from achelous_tpu.core.config import AchelousConfig, WIDTHS

__version__ = "0.1.0"
__all__ = ["AchelousConfig", "WIDTHS"]
