"""Data tier: sprite-shard dataset, sharded device loader, synthesis tools."""

from lunaris_orion_tpu.data.dataset import (  # noqa: F401
    SpriteDataset,
    BatchLoader,
    train_val_split,
)
