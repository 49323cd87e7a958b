from mpnn_tpu.parallel.mesh import (
    make_mesh,
    multihost_init,
    replicated,
    shard_batch,
)
from mpnn_tpu.parallel.data_parallel import (
    make_dp_train_step,
    make_packed_train_step,
    put_dp_batch,
    put_packed_batch,
    put_replicated,
)
from mpnn_tpu.parallel.edge_partition import (
    make_edge_partitioned_spmm,
    make_edge_partitioned_spmm_kernel,
    shard_edges_for_mesh,
    shard_edges_for_spmm_kernel,
)
from mpnn_tpu.parallel.fused_dp import (
    make_fused_dp_train_step,
    plan_shard_windows,
    put_superbatch,
    split_statics,
    stack_shards,
)
