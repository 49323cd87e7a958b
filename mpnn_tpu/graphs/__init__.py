from mpnn_tpu.graphs.encoders import (
    GraphEncoder,
    LabelBinarizer,
    LabelEncoder,
    MinMaxScaler,
)
from mpnn_tpu.graphs.graph import (MolGraph, from_mol,
    from_mol_3d, attach_edge_types)
from mpnn_tpu.graphs.batching import (
    DEFAULT_NODE_BUCKETS,
    PackedBatch,
    attach_edge_vocab,
    bucket_for,
    collate_dense,
    collate_dense_ecfp,
    collate_packed,
    with_edge_types,
)
from mpnn_tpu.graphs.dataset import (
    encode_molgraphs,
    fit_encoders,
    generate_molgraphs,
    load_affinity_dataset,
    load_cache,
    load_classification_dataset,
    load_ecfp_dataset,
    load_number_dataset,
    save_cache,
)
from mpnn_tpu.graphs.dataloader import GraphLoader, PrefetchLoader
