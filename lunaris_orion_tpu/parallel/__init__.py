"""Parallelism tier: device mesh construction and sharding rules.

The reference is strictly single-device (SURVEY.md §2.6); this tier is where
the TPU build scales: a ('data', 'model') mesh with data parallelism over
batch, tensor parallelism over the bottleneck FC pair (the largest weights,
reference lunar_generate.py:124-125,165) and expert parallelism over the
stacked teacher experts. XLA's SPMD partitioner inserts the ICI collectives.
"""

from lunaris_orion_tpu.parallel.mesh import make_mesh, local_mesh  # noqa: F401
from lunaris_orion_tpu.parallel.sharding import (  # noqa: F401
    state_shardings,
    batch_sharding,
    param_spec,
)
