from .mesh import (
    DATA_AXIS,
    local_values,
    device_prefetch,
    all_gather_objects,
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated_sharding,
    shard_batch,
    sync_processes,
)

__all__ = [
    "DATA_AXIS",
    "local_values",
    "device_prefetch",
    "all_gather_objects",
    "data_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "sync_processes",
]
