"""Distributed tests on a virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): DP bit-parity with single-chip,
edge-partitioned SpMM parity (auto-SPMD and explicit shard_map), gradient
exactness through shard_map."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu import graphs as G
from mpnn_tpu import models, parallel
from mpnn_tpu.models.sparse import sparse_mpnn_apply
from mpnn_tpu.train.optim import adam
from mpnn_tpu.train.trainer import make_train_step

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
          "OC(=O)c1ccccc1O"]


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    gs = G.generate_molgraphs(SMILES, [0.1 * i for i in range(len(SMILES))])
    gs, ge = G.encode_molgraphs(gs)
    return gs, ge


def small_net(ge):
    nf = ge.atom_width()
    cfg = models.build("lipo", afm=nf, bfm=ge.bond_width(), nafm=3, n_out=1)
    m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=3,
                            message_steps=3)
    return dataclasses.replace(cfg, mpnn=m)


class TestDataParallel:
    @pytest.mark.slow
    def test_dp_step_matches_single_device(self, setup):
        gs, ge = setup
        net_cfg = small_net(ge)
        params, state = models.network_init(jax.random.PRNGKey(317), net_cfg)
        tx = adam(1e-3)
        opt_state = tx.init(params)
        batch = G.collate_dense(gs, num_nodes=32)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}

        # single-device reference (the step donates its inputs — feed copies
        # so the DP step below can reuse the originals)
        step1 = make_train_step(net_cfg, tx, "mse")
        copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)
        l1, p1, s1, o1 = step1(copy(params), copy(state), copy(opt_state),
                               jb)

        # 8-way DP
        mesh = parallel.make_mesh(data=8)
        stepN = parallel.make_dp_train_step(net_cfg, tx, "mse", mesh)
        db = parallel.put_dp_batch(mesh, jb)
        pN = parallel.put_replicated(mesh, params)
        lN, p2, s2, o2 = stepN(pN, parallel.put_replicated(mesh, state),
                               parallel.put_replicated(mesh, opt_state), db)

        assert float(l1) == pytest.approx(float(lN), abs=1e-5)
        # message_bias has a mathematically ZERO gradient under this config
        # (the masked BN right after the messages annihilates constant
        # shifts), so Adam's sign(g) first step amplifies reduction-order
        # float noise to ±lr there — skip that degenerate leaf.
        flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
        flat2 = jax.tree_util.tree_flatten_with_path(p2)[0]
        for (path, a), (_, b) in zip(flat1, flat2):
            if "message_bias" in jax.tree_util.keystr(path):
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5,
                                       err_msg=jax.tree_util.keystr(path))
        # BN running stats identical (global masked stats under sharding)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


@pytest.mark.slow
class TestEdgePartition:
    def _cfg_params_batch(self, setup):
        gs, ge = setup
        nf = ge.atom_width()
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=8, message_steps=3,
            msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=3)
        params, state = models.mpnn_init(jax.random.PRNGKey(7), cfg)
        packed = G.collate_packed(gs).as_dict()
        packed = parallel.shard_edges_for_mesh(packed, 8)
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        return cfg, params, state, jb

    def test_shard_map_spmm_matches_unsharded(self, setup):
        cfg, params, state, jb = self._cfg_params_batch(setup)
        out_ref, _ = sparse_mpnn_apply(params, state, cfg, jb, training=True)

        mesh = parallel.make_mesh(data=1, edge=8)
        spmm = parallel.make_edge_partitioned_spmm(mesh)
        out_ep, _ = jax.jit(
            lambda p, s, b: sparse_mpnn_apply(p, s, cfg, b, training=True,
                                              spmm_fn=spmm))(params, state,
                                                             jb)
        np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_ep),
                                   atol=5e-4)

    def test_grads_through_shard_map_spmm(self, setup):
        cfg, params, state, jb = self._cfg_params_batch(setup)
        mesh = parallel.make_mesh(data=1, edge=8)
        spmm = parallel.make_edge_partitioned_spmm(mesh)

        def loss(p, spmm_fn):
            out, _ = sparse_mpnn_apply(p, state, cfg, jb, training=True,
                                       spmm_fn=spmm_fn)
            return (out ** 2).mean()

        g_ref = jax.grad(lambda p: loss(p, None))(params)
        g_ep = jax.jit(jax.grad(lambda p: loss(p, spmm)))(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ep)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)

    def test_auto_spmd_packed_train_step(self, setup):
        """Full packed train step with edge arrays sharded over an 8-way
        'edge' axis (XLA auto-partitioning) vs single-device numbers."""
        cfg, params, state, jb = self._cfg_params_batch(setup)
        tx = adam(1e-3)
        opt_state = tx.init(params)

        mesh1 = parallel.make_mesh(data=1, edge=1,
                                   devices=jax.devices()[:1])
        step1 = parallel.make_packed_train_step(cfg, tx, mesh1)
        l1, p1, _, _ = step1(params, state, opt_state, jb)

        mesh = parallel.make_mesh(data=1, edge=8)
        stepN = parallel.make_packed_train_step(cfg, tx, mesh)
        jbN = parallel.put_packed_batch(mesh, jb)
        lN, pN, _, _ = stepN(parallel.put_replicated(mesh, params),
                             parallel.put_replicated(mesh, state),
                             parallel.put_replicated(mesh, opt_state), jbN)
        assert float(l1) == pytest.approx(float(lN), abs=1e-5)
        flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
        flatN = jax.tree_util.tree_flatten_with_path(pN)[0]
        for (path, a), (_, b) in zip(flat1, flatN):
            if "message_bias" in jax.tree_util.keystr(path):
                continue  # zero-grad leaf; see TestDataParallel comment
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5,
                                       err_msg=jax.tree_util.keystr(path))


class TestEdgePartitionKernel:
    """Round-2 VERDICT item 3: the Pallas windowed SpMM INSIDE the
    edge-partitioned shard_map (interpret mode on the virtual mesh) —
    multi-chip EP no longer forfeits the single-chip kernel win."""

    @pytest.mark.slow
    def test_kernel_spmm_sharded_matches_unsharded(self, setup):
        gs, ge = setup
        nf = ge.atom_width()
        cfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=8, message_steps=3,
            msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=3)
        params, state = models.mpnn_init(jax.random.PRNGKey(7), cfg)
        packed = G.collate_packed(gs).as_dict()
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
        packed = parallel.shard_edges_for_spmm_kernel(
            packed, 8, block_edges=64, window=64)
        assert "spmm_win" in packed
        assert packed["edge_src"].shape[0] % (8 * 64) == 0
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}

        out_ref, _ = sparse_mpnn_apply(params, state, cfg, jb,
                                       training=True)
        mesh = parallel.make_mesh(data=1, edge=8)
        spmm = parallel.make_edge_partitioned_spmm_kernel(
            mesh, block_edges=64, window=64, interpret=True)
        out_ep, _ = jax.jit(
            lambda p, s, b: sparse_mpnn_apply(
                p, s, cfg, b, training=True,
                spmm_vocab_fn=spmm))(params, state, jb)
        np.testing.assert_allclose(np.asarray(out_ref),
                                   np.asarray(out_ep), atol=5e-4)

        # gradients: the kernel's custom VJP per shard + the shard_map
        # transpose must reproduce the unsharded grads
        def loss(p, spmm_fn):
            out, _ = sparse_mpnn_apply(p, state, cfg, jb, training=True,
                                       spmm_vocab_fn=spmm_fn)
            return (out ** 2).mean()

        g_ref = jax.grad(lambda p: loss(p, None))(params)
        g_ep = jax.jit(jax.grad(lambda p: loss(p, spmm)))(params)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_ref)[0],
                jax.tree_util.tree_flatten_with_path(g_ep)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3,
                err_msg=jax.tree_util.keystr(path))
