from mini_tpu.parallel.partition import (  # noqa: F401
    PartitionedGraph,
    partition_graph,
)
from mini_tpu.parallel.distributed import (  # noqa: F401
    DeviceShards,
    make_mesh,
    shard_to_mesh,
    dist_bfs,
    dist_sssp,
    dist_spmm,
)
