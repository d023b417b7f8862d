from simpleimagecaptionzoo_tpu.parallel.mesh import (  # noqa: F401
    get_mesh, data_sharding, replicated_sharding, shard_batch,
    replicate_tree, place_params, local_batch_slice,
    host_read, host_allgather, barrier, processes_agree,
    configure_collective_timeout)
