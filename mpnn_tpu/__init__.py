"""mpnn_tpu — a TPU-native message-passing neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference molecular MPNN codebase (Gilmer et al. 2017 style message passing
over molecular graphs): featurization, graph compilation into static-shape
device batches, a library of message/aggregate/update/readout ops, a
configurable model zoo, and a distributed (data-parallel + edge-partitioned)
training stack built on `jax.sharding` meshes.

Layout:
  chem/      RDKit-free SMILES parsing + featurization (optional RDKit backend)
  graphs/    graph containers, feature encoders, batch compilation (dense + COO)
  ops/       pure-functional compute ops (message fns, aggregation, GRU, norms,
             readouts, autoencoders)
  kernels/   Pallas TPU kernels (fused sparse message-passing)
  models/    configurable MPNN covering the full reference model zoo
  parallel/  device mesh setup, data-parallel and edge-partitioned sharding
  train/     optimizers, schedules, metrics, checkpointing, training loops, CLI
"""

__version__ = "0.1.0"
