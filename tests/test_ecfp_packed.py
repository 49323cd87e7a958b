"""Packed-layout ECFP task (round-3 VERDICT item 2): per-atom bit labels
ride the flat node axis ('node_labels', collate_packed), the ecfp_mse loss
gets a packed branch, and the encoded_ecfp config trains FUSED through the
per-step whole-step kernel (the one reference task that had zero packed/
fused story)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CC(C)O",
          "NC(=O)c1ccccc1", "CCCN", "OC(=O)c1ccccc1O", "CCOC", "CCCC",
          "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "c1ccccc1N"]
NBITS = 64


def _ecfp_graphs():
    from mpnn_tpu import graphs as G
    from mpnn_tpu.chem import mol_from_smiles
    from mpnn_tpu.chem.ecfp import ecfp_bits_per_atom
    from mpnn_tpu.graphs.graph import from_mol
    raw = []
    for s in SMILES:
        mol = mol_from_smiles(s)
        g = from_mol(mol, label=0.0)
        g.label = ecfp_bits_per_atom(mol, radius=2, nbits=NBITS)
        raw.append(g)
    return G.encode_molgraphs(raw)


class TestPackedCollation:
    def test_node_labels_packed(self):
        from mpnn_tpu import graphs as G
        gs, ge = _ecfp_graphs()
        loader = G.GraphLoader(gs, len(SMILES), collate="packed",
                               fused_step_plan=True)
        b = next(iter(loader))
        assert "node_labels" in b
        nl = np.asarray(b["node_labels"])
        assert nl.shape[-1] == NBITS
        # real rows match each graph's bits; padded rows are zero
        off = 0
        for g in gs:
            np.testing.assert_array_equal(nl[off:off + g.num_atoms],
                                          g.label)
            off += g.num_atoms
        assert not nl[off:].any()

    def test_scalar_labels_unaffected(self):
        from mpnn_tpu import graphs as G
        gs, ge = G.encode_molgraphs(G.generate_molgraphs(
            SMILES, [0.1 * len(s) for s in SMILES]))
        b = next(iter(G.GraphLoader(gs, len(SMILES), collate="packed")))
        assert "node_labels" not in b


class TestPackedEcfpLoss:
    def test_packed_vs_dense_gradient_relation(self):
        """The packed loss averages over REAL atom entries; the dense
        reference's .mean() also averages zero-gradient padding terms —
        the gradients therefore agree up to the exact factor
        count/(B·N)."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu import models
        from mpnn_tpu.models.network import NetworkConfig, network_init
        from mpnn_tpu.train.trainer import make_loss_fn
        gs, ge = _ecfp_graphs()
        nf = ge.atom_width()
        mcfg = models.MPNNConfig(
            node_features=nf, edge_features=ge.bond_width(),
            message_features=nf, output_dim=8, message_steps=2,
            edge_mlp_tail_repeats=2)
        cfg = NetworkConfig(mpnn=mcfg, input_wrapper="plain",
                            head="linear", head_output=NBITS)
        params, state = network_init(jax.random.PRNGKey(0), cfg)
        loss_fn = make_loss_fn(cfg, "ecfp_mse")
        packed = next(iter(G.GraphLoader(gs, len(SMILES),
                                         collate="packed")))
        dense = next(iter(G.GraphLoader(gs, len(SMILES), collate="dense",
                                        use_native=False)))
        jp = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        jd = {k: jnp.asarray(v) for k, v in dense.items()}

        def lp(p, s):
            return loss_fn(p, s, jp, True)[0]

        def ld(p, s):
            return loss_fn(p, s, jd, True)[0]

        gp = jax.grad(lp)(params, state)
        gd = jax.grad(ld)(params, state)
        b, n = np.asarray(dense["mask"]).shape[:2]
        count = float(np.asarray(packed["node_mask"]).sum())
        scale = count / (b * n)
        fp_, tp_ = jax.tree.flatten(gp)
        fd_, td_ = jax.tree.flatten(gd)
        assert tp_ == td_
        for i, (a, c) in enumerate(zip(fp_, fd_)):
            np.testing.assert_allclose(
                np.asarray(a) * scale, np.asarray(c), rtol=2e-4,
                atol=1e-6, err_msg=f"leaf {i}")


class TestEncodedEcfpFusedTraining:
    def test_trains_packed_and_fused(self):
        """encoded_ecfp (per-step msg bn1d + state 'none' + output BN +
        16384-style multi-label head) trains packed with fuse_step=True,
        and the fused loss matches the unfused XLA run exactly."""
        from mpnn_tpu import graphs as G
        from mpnn_tpu.models import zoo
        from mpnn_tpu.models.fused_train import fused_step_eligible
        from mpnn_tpu.train import trainer
        gs, ge = _ecfp_graphs()
        net = zoo.build("encoded_ecfp", afm=ge.atom_width(),
                        bfm=ge.bond_width(), n_out=NBITS, enc_afm=8,
                        enc_bfm=2)
        net = dataclasses.replace(net, mpnn=dataclasses.replace(
            net.mpnn, edge_mlp_tail_repeats=2, message_steps=2))
        probe = next(iter(G.GraphLoader(gs, len(SMILES),
                                        collate="packed",
                                        fused_step_plan=True)))
        assert fused_step_eligible(net.mpnn, probe, training=True)
        tcfg = trainer.TrainConfig(
            epochs=2, batch_size=len(SMILES), learning_rate=1e-3,
            loss="ecfp_mse", packed=True, fuse_step=True,
            spmm="kernel_interpret", seed=317, shuffle=False,
            log_path=None)
        _, _, _, hist = trainer.train(net, tcfg, gs)
        tcfg2 = dataclasses.replace(tcfg, fuse_step=False, spmm="xla")
        _, _, _, hist2 = trainer.train(net, tcfg2, gs)
        for h, h2 in zip(hist, hist2):
            assert np.isfinite(h["train_loss"])
            np.testing.assert_allclose(h["train_loss"], h2["train_loss"],
                                       rtol=1e-4)


class TestGraphLabelSums:
    """The block-matmul plan branch of trainer.graph_label_sums must be
    bit-exact vs the segment_sum fallback (it replaced a 9.25 ms TPU
    scatter with 0.77 ms of window matmuls — scripts/probe_ecfp_s1.py)."""

    def test_plan_branch_exact(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from mpnn_tpu import graphs as G
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        from mpnn_tpu.train.trainer import graph_label_sums

        gs, _ = _ecfp_graphs()
        packed = G.collate_packed(gs).as_dict()
        packed = attach_fused_plan(packed, block_edges=512)
        assert "fs_ns" in packed
        n = packed["node_feats"].shape[0]
        n_graphs = packed["graph_mask"].shape[0]
        rs = np.random.RandomState(0)
        bits = jnp.asarray(
            (rs.rand(n, 48) < 0.1).astype(np.uint8)
            * np.asarray(packed["node_mask"]).astype(np.uint8))
        jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
              for k, v in packed.items()}
        ref = graph_label_sums(bits, jb["node_graph"], {}, n_graphs,
                               jnp.float32)
        got = graph_label_sums(bits, jb["node_graph"], jb, n_graphs,
                               jnp.float32,
                               node_window=jb["fs_node_window"])
        assert got.shape == (n_graphs, 48)
        assert float(jnp.abs(got - ref).max()) == 0.0
        jitted = jax.jit(lambda b, d: graph_label_sums(
            b, d["node_graph"], d, n_graphs, jnp.float32,
            node_window=packed["fs_node_window"]))
        assert float(jnp.abs(jitted(bits, jb) - ref).max()) == 0.0


class TestGraphLabelSumsChunkedScan:
    def test_large_gb_branch_matches_segment_sum(self):
        """The gb>16 chunked-scan branch (round 5: unwedges the 53k-node
        compile) must equal the scatter form bit-for-bit, including the
        padded-chunk tail (gb not a multiple of 8)."""
        import jax.numpy as jnp
        from mpnn_tpu.train.trainer import (GRAPH_LABEL_BLOCK,
                                            graph_label_sums)
        rng = np.random.RandomState(0)
        n_graphs = 17 * GRAPH_LABEL_BLOCK + 37     # gb=18 > 16, ragged
        npg = 3                                     # nodes per graph
        n = n_graphs * npg
        bits = 24
        nl = (rng.rand(n, bits) < 0.1).astype(np.float32)
        ng = np.repeat(np.arange(n_graphs, dtype=np.int32), npg)
        # fs_ns windows: graph block j starts at node j*128*npg (128-
        # aligned window starts per the plan contract)
        nw = 1024
        ns = np.asarray([(j * GRAPH_LABEL_BLOCK * npg) // 128 * 128
                         for j in range(18)], np.int32)
        batch = {"fs_ns": jnp.asarray(ns)}
        got = graph_label_sums(jnp.asarray(nl), jnp.asarray(ng), batch,
                               n_graphs, jnp.float32, node_window=nw)
        import jax
        want = jax.ops.segment_sum(jnp.asarray(nl), jnp.asarray(ng),
                                   num_segments=n_graphs,
                                   indices_are_sorted=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0)
