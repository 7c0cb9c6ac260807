"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's single-process ``nn.DataParallel`` (SURVEY.md §2.5, §5.8)."""

from .mesh import (
    get_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_device_count,
)

__all__ = [
    "get_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_device_count",
]
