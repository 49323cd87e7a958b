from mpnn_tpu.models.config import MPNNConfig
from mpnn_tpu.models.mpnn import mpnn_init, mpnn_apply
from mpnn_tpu.models.network import (
    NetworkConfig,
    network_init,
    network_apply,
    halving_dims,
)
from mpnn_tpu.models.zoo import ZOO, build
