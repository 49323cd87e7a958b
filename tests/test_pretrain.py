"""Pretraining + filter tests."""

import numpy as np
import pytest

from mpnn_tpu import graphs as G
from mpnn_tpu.graphs.filters import (
    affinity_labels, binarize_target, filter_by_label_count,
)
from mpnn_tpu.train import pretrain

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)O", "CCN", "c1ccncc1",
          "CCS", "CCCl", "C1CCCCC1", "NC(=O)C"]


@pytest.fixture(scope="module")
def encoded_graphs():
    gs = G.generate_molgraphs(SMILES, [i % 3 for i in range(len(SMILES))])
    gs, ge = G.encode_molgraphs(gs)
    return gs, ge


class TestAutoencoderPretrain:
    def test_loss_decreases_and_shapes(self, encoded_graphs):
        gs, ge = encoded_graphs
        params, state, loss = pretrain.pretrain_autoencoder(
            gs, "atom", epochs=60, lr=1e-2)
        assert np.isfinite(loss)
        in_dim = ge.atom_width()
        assert params["enc"][0]["w"].shape[0] == in_dim
        # encoder half usable standalone
        from mpnn_tpu.ops.autoencoders import tanh_encoder_apply
        import jax.numpy as jnp
        z = tanh_encoder_apply(params, jnp.asarray(gs[0].afm))
        assert z.shape == (gs[0].num_atoms, params["enc"][1]["w"].shape[1])

    def test_bond_autoencoder(self, encoded_graphs):
        gs, ge = encoded_graphs
        params, state, loss = pretrain.pretrain_autoencoder(
            gs, "bond", epochs=30)
        assert np.isfinite(loss)


class TestEmbeddingPretrain:
    def test_vocab_and_reconstruction(self, encoded_graphs):
        gs, _ = encoded_graphs
        # build raw graphs (unencoded rows give small vocab)
        raw = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
        vocab = pretrain.build_vocab(raw, "atom")
        assert 1 < len(vocab) < 60
        params, state, vocab, acc = pretrain.pretrain_embedding_encoder(
            raw, "atom", epochs=400)
        assert acc == 1.0   # tiny vocab must be perfectly reconstructable

    def test_embed_graphs(self):
        raw = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
        ap, _, av, _ = pretrain.pretrain_embedding_encoder(
            raw, "atom", epochs=50)
        bp, _, bv, _ = pretrain.pretrain_embedding_encoder(
            raw, "bond", epochs=50)
        out = pretrain.embed_graphs(raw, ap, av, bp, bv)
        g = out[0]
        assert g.afm.shape[-1] == 4 and g.bfm.shape[-1] == 2
        # non-bond positions zeroed (test_embed.py:118 semantics)
        nb = g.adj == 0
        assert np.all(g.bfm[nb] == 0)


class TestFilters:
    def _graphs(self, labels):
        gs = G.generate_molgraphs(SMILES[:len(labels)], labels)
        return gs

    def test_filter_by_count(self):
        labels = [0, 0, 0, 1, 1, 2, 3, 3, 3, 3]
        gs, new_labels, n = filter_by_label_count(self._graphs(labels),
                                                  lower_cutoff=1)
        # classes with count > 1: 0 (3), 1 (2), 3 (4) → relabeled 0,1,2
        assert n == 3
        assert set(new_labels) == {0, 1, 2}

    def test_keep_first(self):
        labels = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]
        gs, new_labels, n = filter_by_label_count(
            self._graphs(labels), lower_cutoff=0, keep_first=2)
        assert n == 2 and set(new_labels) == {0, 1}

    def test_binarize_and_affinity(self):
        gs = self._graphs([0, 1, 2, 1])
        binarize_target(gs, 1)
        assert [g.label for g in gs] == [0, 1, 0, 1]
        gs2 = self._graphs([0, 1, 2, 1])
        for i, g in enumerate(gs2):
            g.affinity = 6.0 + i
        affinity_labels(gs2, 1)
        assert gs2[1].label == 7.0 and gs2[0].label == 4.0


class TestOtherAutoencoders:
    def test_generic_sigmoid_ae(self):
        import jax
        import jax.numpy as jnp
        from mpnn_tpu.ops.autoencoders import (
            generic_autoencoder_init, generic_autoencoder_apply,
            generic_encoder_apply)
        p = generic_autoencoder_init(jax.random.PRNGKey(0), in_dim=12,
                                     mid_dim=8, e_dim=3)
        x = jax.random.uniform(jax.random.PRNGKey(1), (5, 12))
        z = generic_encoder_apply(p, x)
        out = generic_autoencoder_apply(p, x)
        assert z.shape == (5, 3) and out.shape == (5, 12)
        assert float(out.min()) >= 0 and float(out.max()) <= 1  # sigmoid

    def test_parametric_ae_dims(self):
        import jax
        from mpnn_tpu.ops.autoencoders import parametric_autoencoder_init
        # c_autoencoder.py:8-10: mid=ceil(in/2), e=mid//2
        params, state = parametric_autoencoder_init(jax.random.PRNGKey(2),
                                                    in_features=11)
        assert params["enc"][0]["w"].shape == (11, 6)
        assert params["enc"][1]["w"].shape == (6, 3)


class TestProfilerTrace:
    def test_trace_writes_dir(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from mpnn_tpu.utils.profiling import trace, annotate
        d = str(tmp_path / "prof")
        with trace(d):
            with annotate("demo-region"):
                jnp.ones((8, 8)).sum().block_until_ready()
        import os
        found = []
        for root, _, files in os.walk(d):
            found += files
        assert found, "profiler trace produced no files"
