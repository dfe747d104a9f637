from .sharding import (
    make_ray_mesh,
    shard_batch,
    replicate,
    sharded_bp_update,
    sharded_raynet_message_step,
)
