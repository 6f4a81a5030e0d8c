from representation_disentanglement_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, mesh_from_config, replicate, shard_batch,
    shard_epoch_plan)
