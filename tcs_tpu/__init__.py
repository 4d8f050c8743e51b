"""TC-Stereo TPU: a TPU-native (JAX/XLA/Pallas) framework for temporally
consistent stereo matching.

This package provides the full capability surface of the reference
TC-Stereo system (ECCV 2024, jiaxiZeng/Temporally-Consistent-Stereo-Matching),
re-designed TPU-first:

- ``tcs_tpu.ops``       : sampling / correlation / softmax-splatting kernels
                          (pure-jnp reference implementations + Pallas kernels)
- ``tcs_tpu.geometry``  : pinhole geometry, pose-based temporal warps
- ``tcs_tpu.models``    : Flax modules (encoders, GRU stack, refinement heads,
                          the TCStereo model)
- ``tcs_tpu.losses``    : sequence / init (cost-volume contrastive) /
                          normal / gradient losses
- ``tcs_tpu.train``     : jitted train step (frame-scan BPTT), optimizer,
                          training driver
- ``tcs_tpu.data``      : dataset indexers, readers, sequence-consistent
                          augmentation, device-sharded batching
- ``tcs_tpu.parallel``  : mesh / sharding helpers (data-parallel over ICI/DCN)
- ``tcs_tpu.utils``     : padding with intrinsics tracking, checkpointing,
                          logging, visualization
"""

__version__ = "0.1.0"

from tcs_tpu.config import ModelConfig, TrainConfig  # noqa: F401
