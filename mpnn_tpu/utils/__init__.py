from mpnn_tpu.utils.initializers import (
    kaiming_uniform,
    xavier_uniform_sigmoid,
    torch_linear_default,
    uniform_bound,
)
