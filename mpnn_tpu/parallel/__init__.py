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
    shard_edges_for_mesh,
)
