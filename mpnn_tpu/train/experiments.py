"""Experiment registry — one named entry per reference driver script
(SURVEY.md §2.5 table; BASELINE.json configs). Each experiment bundles the
dataset loader flavor, model-zoo builder, loss, and the driver's
hyperparameters (batch size, lr, weight decay, schedules, gates).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

from mpnn_tpu.models import zoo
from mpnn_tpu.train.trainer import TrainConfig


@dataclasses.dataclass(frozen=True)
class Experiment:
    name: str
    task: str                       # classification|regression|affinity|ecfp
    model: str                      # zoo builder name
    loss: str
    train: TrainConfig
    mol_col: str = "smiles"
    label_col: str = "target"
    affinity_col: Optional[str] = None
    binarize_target_class: Optional[int] = None   # one-vs-rest (test_single_target.py:101)
    affinity_target_class: Optional[int] = None   # label←affinity if class
                                                  # matches else 4.0
                                                  # (test_graph_encode_affinity.py:126-128)
    filter_lower_count: Optional[int] = None      # class-count filter
    filter_upper_count: Optional[int] = None
    filter_keep_first: Optional[int] = None       # (test_graph_encode_norm.py:101)
    embed_features: bool = False    # pretrain+apply embedding encoders (test_embed)
    edge_types: bool = False        # derive GGNN bond-type ids at featurize
    notes: str = ""


EXPERIMENTS: Dict[str, Experiment] = {}


def _register(e: Experiment):
    EXPERIMENTS[e.name] = e
    return e


# test.py: multi-class classification, bs 16, 500 epochs, plain Adam,
# F1>0.78 checkpoint gate
_register(Experiment(
    name="basic_classification", task="classification", model="basic",
    loss="ce",
    train=TrainConfig(epochs=500, batch_size=16, learning_rate=1e-3, loss="ce",
                      metric_average="weighted", ckpt_f1_gate=0.78),
    label_col="target",
    notes="test.py driver equivalent (InChI input needs the RDKit backend; "
          "SMILES works built-in)"))

# test_adv.py: attention model, early-stop at train loss < 0.02
_register(Experiment(
    name="adv_classification", task="classification", model="adv", loss="ce",
    train=TrainConfig(epochs=500, batch_size=16, learning_rate=1e-3, loss="ce",
                      early_stop_loss=0.02),
    notes="test_adv.py: MolGraphModelNoRep (AttEdge+AttAgg+Set2Vec)"))

# test_lipo.py: regression, Adam 1e-2/wd 1e-4 + ReduceLROnPlateau, bs 16,
# 1000 epochs
_register(Experiment(
    name="lipo", task="regression", model="lipo", loss="mse",
    train=TrainConfig(epochs=1000, batch_size=16, learning_rate=1e-2,
                      weight_decay=1e-4, loss="mse", plateau=True),
    label_col="exp",
    notes="test_lipo.py: the flagship Lipophilicity config"))

# GGNN in the lipo shell: the reference imports GGNNMsgPass in its lipo
# driver but never wires it (lipo_basic_model.py:4) — this makes that
# latent composition trainable end-to-end (and it rides the whole-step
# fused kernel: natively A-form, fuse_step-eligible)
_register(Experiment(
    name="lipo_ggnn", task="regression", model="lipo_ggnn", loss="mse",
    train=TrainConfig(epochs=1000, batch_size=16, learning_rate=1e-2,
                      weight_decay=1e-4, loss="mse", plateau=True),
    label_col="exp", edge_types=True,
    notes="GGNN messages in the lipo shell (the reference's latent "
          "lipo_basic_model.py:4 composition)"))

# models/att_model.py: AttEdgeNetwork + AdjMsgAgg + per-step fns +
# stateless masked BN + Set2Vec — the reference composition has no
# dedicated driver script; classification hyperparameters follow the
# sibling attention driver (test_adv.py)
_register(Experiment(
    name="att_classification", task="classification", model="att",
    loss="ce",
    train=TrainConfig(epochs=500, batch_size=16, learning_rate=1e-3,
                      loss="ce"),
    notes="models/att_model.py: per-step AttEdge + stateless BN + "
          "Set2Vec (driverless reference composition)"))

# test_graph_norm.py: normed model classification
_register(Experiment(
    name="graph_norm_classification", task="classification",
    model="graph_norm", loss="ce",
    train=TrainConfig(epochs=500, batch_size=16, learning_rate=1e-3, loss="ce",
                      ckpt_f1_gate=0.78),
    notes="test_graph_norm.py: per-step messages + stateless masked BN"))

# test_graph_encode_norm.py: encoded model, bs 128, Adam 1e-3 wd 1e-5,
# micro metrics, F1>0.8 gate
_register(Experiment(
    name="encoded_classification", task="classification", model="encoded",
    loss="ce",
    train=TrainConfig(epochs=500, batch_size=128, learning_rate=1e-3,
                      weight_decay=1e-5, loss="ce", metric_average="micro",
                      ckpt_f1_gate=0.8),
    notes="test_graph_encode_norm.py: frozen AEs + per-step BN pairs"))

# test_graph_encode_affinity.py: affinity regression, bs 128,
# filter 49<count<100, label = affinity where class==target else 4.0
_register(Experiment(
    name="encoded_affinity", task="affinity", model="encoded", loss="mse",
    train=TrainConfig(epochs=500, batch_size=128, learning_rate=1e-3,
                      weight_decay=1e-5, loss="mse"),
    affinity_col="pXC50",
    filter_lower_count=49, filter_upper_count=100,
    affinity_target_class=243,
    notes="test_graph_encode_affinity.py: label = affinity for the target "
          "class else constant 4"))

# test_graph_encode_norm_single.py: encoded model + one-vs-rest target 243,
# bs 16, lr 1e-3, F1>0.8 gate
_register(Experiment(
    name="encoded_single_target", task="classification", model="encoded",
    loss="ce",
    train=TrainConfig(epochs=500, batch_size=16, learning_rate=1e-3,
                      loss="ce", metric_average="binary", ckpt_f1_gate=0.8),
    binarize_target_class=243,
    notes="test_graph_encode_norm_single.py: encoded model, binary "
          "one-vs-rest target 243"))

# test_graph_encode_norm_ecfp.py: ECFP multi-label, bs 128
_register(Experiment(
    name="encoded_ecfp", task="ecfp", model="encoded_ecfp", loss="ecfp_mse",
    train=TrainConfig(epochs=500, batch_size=128, learning_rate=1e-3,
                      weight_decay=1e-5, loss="ecfp_mse"),
    notes="test_graph_encode_norm_ecfp.py: 16384-bit Morgan multi-label"))


# models/basic_model_ecfp.py: bilinear message + state-history readout on
# the per-atom ECFP multi-label task — the reference composition has no
# dedicated driver; hyperparameters follow the ECFP driver
_register(Experiment(
    name="ecfp_bilinear", task="ecfp", model="ecfp_bilinear",
    loss="ecfp_mse",
    train=TrainConfig(epochs=500, batch_size=128, learning_rate=1e-3,
                      weight_decay=1e-5, loss="ecfp_mse"),
    notes="models/basic_model_ecfp.py: BiLiniearEdgeNetwork + "
          "concat-state-history readout (driverless reference "
          "composition)"))

# test_single_target.py: binary one-vs-rest on a hardcoded target class
# (243), basic model + 4-layer MLP head
_register(Experiment(
    name="single_target", task="classification", model="single_target",
    loss="ce",
    train=TrainConfig(epochs=500, batch_size=16, learning_rate=1e-3,
                      loss="ce", metric_average="binary"),
    binarize_target_class=243,
    notes="test_single_target.py: one-vs-rest target 243, MLP head"))

# test_embed.py: classification over pretrained embedding features; the
# embedding encoders are pretrained in-run (the reference loads pickles)
_register(Experiment(
    name="embed_classification", task="classification", model="basic",
    loss="ce",
    train=TrainConfig(epochs=500, batch_size=16, learning_rate=1e-3,
                      loss="ce"),
    embed_features=True,
    notes="test_embed.py: afm/bfm replaced by pretrained 4-d/2-d embeddings"))


def get(name: str) -> Experiment:
    return EXPERIMENTS[name]
