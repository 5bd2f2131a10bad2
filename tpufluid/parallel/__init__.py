from .shard import (  # noqa: F401
    ShardSpec,
    ShardedState,
    build_shard_spec,
    gather_state,
    init_sharded,
    make_mesh,
    make_sharded_step,
)
