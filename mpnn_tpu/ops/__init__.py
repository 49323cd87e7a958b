from mpnn_tpu.ops.linear import linear_init, linear_apply
from mpnn_tpu.ops.message import (
    edge_network_init,
    edge_network_precompute,
    edge_network_fused,
    edge_network_pairwise_matrices,
    att_edge_network_init,
    att_edge_network_apply,
    bilinear_edge_network_apply,
    ggnn_init,
    ggnn_fused,
)
from mpnn_tpu.ops.aggregate import (
    adj_agg,
    wadj_agg,
    att_agg_init,
    att_agg,
    segment_agg,
)
from mpnn_tpu.ops.update import gru_init, gru_apply
from mpnn_tpu.ops.norm import mask_batch_norm, bn1d_init, bn1d_apply
from mpnn_tpu.ops.readout import (
    graph_level_output_init,
    graph_level_output_apply,
    set2vec_init,
    set2vec_apply,
)
