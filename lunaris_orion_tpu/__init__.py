"""lunaris_orion_tpu — a TPU-native JAX rebuild of MeryylleA/Lunaris-Orion.

A hybrid pixel-art generation framework: a convolutional VAE
(reference: /root/reference/lunar_generate.py) co-trained with a
Mixture-of-Experts quality "teacher" (reference: /root/reference/lunar_evaluator.py)
under an MSE + KL + policy-gradient loop (reference: /root/reference/train_hybrid.py).

Nothing here is a port: the compute path is jit/pjit-compiled XLA with Pallas
(Mosaic) TPU kernels for the hot ops, data-parallel/expert-parallel sharding
over a `jax.sharding.Mesh`, and a device-side input pipeline.
"""

__version__ = "0.1.0"

from lunaris_orion_tpu.config import (  # noqa: F401
    VAEConfig,
    TeacherConfig,
    TrainConfig,
)
