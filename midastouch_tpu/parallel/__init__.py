from midastouch_tpu.parallel.sharding import (  # noqa: F401
    make_device_mesh,
    make_sharded_update,
    shard_state,
    state_shardings,
)
