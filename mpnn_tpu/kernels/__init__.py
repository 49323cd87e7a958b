from mpnn_tpu.kernels.edge_mlp import (
    edge_mlp_forward,
    edge_mlp_backward,
    make_edge_mlp_op,
)
