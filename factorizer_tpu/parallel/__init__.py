from .mesh import (
    make_mesh,
    data_parallel_mesh,
    batch_sharding,
    replicated,
    local_device_count,
    initialize_distributed,
    process_is_primary,
)
from .sharding import param_sharding_rules, input_sharding, shard_variables
