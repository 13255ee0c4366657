from checkerpose_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate_tree, data_sharding,
)
