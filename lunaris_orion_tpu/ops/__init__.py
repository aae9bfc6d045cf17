"""NN building blocks (ops tier).

Pure functions over explicit parameter pytrees, NHWC layout (TPU-native),
with Pallas TPU kernels for the hot paths behind `lunaris_orion_tpu.ops.dispatch`.
"""

from lunaris_orion_tpu.ops.activations import mish, leaky_relu  # noqa: F401
from lunaris_orion_tpu.ops.layers import (  # noqa: F401
    conv2d,
    conv2d_init,
    conv2d_transpose,
    conv2d_transpose_init,
    linear,
    linear_init,
    group_norm,
    group_norm_init,
    group_norm_mish,
    layer_norm,
    layer_norm_init,
    batch_norm,
    batch_norm_init,
    dropout,
    global_avg_pool,
)
from lunaris_orion_tpu.ops.attention import spatial_attention_reference  # noqa: F401
