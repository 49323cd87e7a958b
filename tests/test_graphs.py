"""Graph-compiler tests: encoders vs sklearn, featurize→encode→batch
pipeline, cache round-trip, bucketing, packed↔dense equivalence."""

import os

import numpy as np
import pytest

from mpnn_tpu import chem, graphs


SMILES = [
    "CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
    "OC(=O)c1ccccc1O", "ClCCl", "BrC(Br)Br",
]


def make_graphs(labels=None):
    gs = graphs.generate_molgraphs(
        SMILES, labels if labels is not None else list(range(len(SMILES))))
    gs, ge = graphs.encode_molgraphs(gs)
    return gs, ge


class TestEncodersVsSklearn:
    def test_label_binarizer(self):
        from sklearn.preprocessing import LabelBinarizer as SK
        for classes, query in [([1, 2, 3, 7], [1, 7, 2]),
                               ([0, 1], [0, 1, 1]),
                               ([4], [4, 4])]:
            ours = graphs.LabelBinarizer().fit(classes)
            sk = SK().fit(classes)
            np.testing.assert_array_equal(ours.transform(query),
                                          sk.transform(query))

    def test_label_encoder(self):
        from sklearn.preprocessing import LabelEncoder as SK
        y = ["b", "a", "c", "a"]
        np.testing.assert_array_equal(
            graphs.LabelEncoder().fit_transform(y), SK().fit_transform(y))

    def test_minmax(self):
        from sklearn.preprocessing import MinMaxScaler as SK
        rs = np.random.RandomState(0)
        x = rs.randn(20, 3)
        x[:, 2] = 5.0  # zero-range column
        ours = graphs.MinMaxScaler().fit(x)
        sk = SK().fit(x)
        np.testing.assert_allclose(ours.transform(x), sk.transform(x),
                                   atol=1e-6)


class TestPipeline:
    def test_encode_widths(self):
        gs, ge = make_graphs()
        g = gs[0]
        assert g.is_encoded
        assert g.afm.shape[-1] == ge.atom_width()
        assert g.bfm.shape[-1] == ge.bond_width()
        assert g.edge_feats.shape[-1] == ge.bond_width()
        # nafm scaled into [0, 1]
        for g in gs:
            assert g.nafm.min() >= 0 and g.nafm.max() <= 1 + 1e-6

    def test_bond_onehot_zero_at_nonbonds(self):
        gs, ge = make_graphs()
        for g in gs:
            nb = g.adj == 0
            assert np.all(g.bfm[nb] == 0)

    def test_dense_collation(self):
        gs, ge = make_graphs()
        batch = graphs.collate_dense(gs[:4])
        b, n, f = batch["afm"].shape
        assert b == 4 and n in graphs.DEFAULT_NODE_BUCKETS
        assert batch["mask"].sum() == sum(g.num_atoms for g in gs[:4])
        # symmetric adjacency preserved
        np.testing.assert_array_equal(batch["adj"],
                                      batch["adj"].transpose(0, 2, 1))

    def test_packed_collation_matches_dense_aggregation(self):
        import jax.numpy as jnp
        from mpnn_tpu import ops
        gs, ge = make_graphs()
        chunk = gs[:4]
        dense = graphs.collate_dense(chunk)
        packed = graphs.collate_packed(chunk)
        # edge-sum of source features == dense adj @ afm per graph
        e = ops.segment_agg(
            jnp.asarray(packed.node_feats)[packed.edge_src]
            * packed.edge_mask[:, None],
            jnp.asarray(packed.edge_dst),
            num_nodes=packed.node_feats.shape[0])
        want = np.einsum("bvw,bwf->bvf", dense["adj"], dense["afm"])
        got = np.asarray(e)
        off = 0
        for gi, g in enumerate(chunk):
            a = g.num_atoms
            np.testing.assert_allclose(got[off:off + a], want[gi, :a],
                                       atol=1e-5)
            off += a
        # padded edges all point at the dummy sink
        pad = packed.edge_mask == 0
        assert np.all(packed.edge_src[pad] == packed.node_feats.shape[0] - 1)

    def test_bucketing(self):
        assert graphs.bucket_for(3) == 8
        assert graphs.bucket_for(8) == 8
        assert graphs.bucket_for(9) == 16
        assert graphs.bucket_for(200) == 256

    def test_loader_bucketed_static_shapes(self):
        gs, ge = make_graphs()
        loader = graphs.GraphLoader(gs, batch_size=3, shuffle=True,
                                    bucketed=True)
        shapes = set()
        n_graphs = 0
        for batch in loader:
            shapes.add(batch["afm"].shape[1])
            n_graphs += batch["afm"].shape[0]
        assert n_graphs == len(gs)
        assert shapes <= set(graphs.DEFAULT_NODE_BUCKETS)

    def test_loader_shuffle_deterministic(self):
        gs, ge = make_graphs()
        l1 = graphs.GraphLoader(gs, 4, shuffle=True, seed=7)
        l2 = graphs.GraphLoader(gs, 4, shuffle=True, seed=7)
        for b1, b2 in zip(l1, l2):
            np.testing.assert_array_equal(b1["labels"], b2["labels"])


class TestLoadersAndCache:
    def _write_csv(self, tmp_path, with_affinity=False):
        import pandas as pd
        rows = {"smiles": SMILES,
                "target": [i % 3 for i in range(len(SMILES))],
                "exp": [0.1 * i for i in range(len(SMILES))]}
        if with_affinity:
            rows["pXC50"] = [5.0 + i for i in range(len(SMILES))]
        p = os.path.join(tmp_path, "data.csv")
        pd.DataFrame(rows).to_csv(p, index=False)
        return p

    def test_classification_loader(self, tmp_path):
        p = self._write_csv(str(tmp_path))
        gs, n_classes, labels, ge = graphs.load_classification_dataset(
            p, "smiles", "target")
        assert n_classes == 3 and len(gs) == len(SMILES)
        assert ge.label_enc is not None

    def test_number_loader(self, tmp_path):
        p = self._write_csv(str(tmp_path))
        gs, ge = graphs.load_number_dataset(p, "smiles", "exp")
        assert isinstance(gs[0].label, float)

    def test_affinity_loader(self, tmp_path):
        p = self._write_csv(str(tmp_path), with_affinity=True)
        gs, n, labels, ge = graphs.load_affinity_dataset(
            p, "smiles", "target", "pXC50")
        assert gs[0].affinity == 5.0

    def test_ecfp_loader(self, tmp_path):
        p = self._write_csv(str(tmp_path))
        gs, ge = graphs.load_ecfp_dataset(p, "smiles", "target", nbits=512)
        assert gs[0].label.shape == (gs[0].num_atoms, 512)

    def test_cache_roundtrip(self, tmp_path):
        p = self._write_csv(str(tmp_path))
        gs, ge = graphs.load_number_dataset(p, "smiles", "exp")
        cache = os.path.join(str(tmp_path), "cache.npz")
        graphs.save_cache(cache, gs, ge)
        gs2, ge2, meta = graphs.load_cache(cache)
        assert len(gs2) == len(gs)
        for a, b in zip(gs, gs2):
            np.testing.assert_allclose(a.afm, b.afm, atol=1e-6)
            np.testing.assert_allclose(a.bfm, b.bfm, atol=1e-6)
            np.testing.assert_array_equal(a.adj, b.adj)
            assert float(a.label) == pytest.approx(float(b.label))
        assert ge2.atom_width() == ge.atom_width()


class TestPrefetchLoader:
    def test_same_batches_as_inner_loader(self):
        gs, ge = make_graphs()
        inner1 = graphs.GraphLoader(gs, 3, shuffle=True, seed=5)
        inner2 = graphs.GraphLoader(gs, 3, shuffle=True, seed=5)
        from mpnn_tpu.graphs import PrefetchLoader
        pre = PrefetchLoader(inner2, prefetch=2)
        got = list(pre)
        want = list(inner1)
        assert len(got) == len(want) == len(pre)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a["labels"], b["labels"])

    def test_to_device_hook(self):
        gs, ge = make_graphs()
        from mpnn_tpu.graphs import PrefetchLoader
        calls = []
        pre = PrefetchLoader(graphs.GraphLoader(gs, 4), prefetch=1,
                             to_device=lambda b: (calls.append(1), b)[1])
        n = sum(1 for _ in pre)
        assert len(calls) == n

    def test_producer_exception_propagates(self):
        gs, ge = make_graphs()
        from mpnn_tpu.graphs import PrefetchLoader

        def boom(batch):
            raise RuntimeError("collate exploded")

        pre = PrefetchLoader(graphs.GraphLoader(gs, 4), to_device=boom)
        with pytest.raises(RuntimeError, match="collate exploded"):
            list(pre)


def test_prefetch_pool_matches_sequential():
    """PrefetchLoader(workers>1) must yield the SAME batches in the SAME
    order as the sequential loader (ordered futures window)."""
    import numpy as np
    from mpnn_tpu import graphs as G
    from mpnn_tpu.graphs.dataloader import GraphLoader, PrefetchLoader
    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "C1CCCCC1",
              "NC(=O)c1ccccc1"] * 6
    gs, _ = G.encode_molgraphs(G.generate_molgraphs(
        smiles, list(range(len(smiles)))))
    ref = list(GraphLoader(gs, 8, collate="packed", fused_step_plan=True))
    pool = list(PrefetchLoader(
        GraphLoader(gs, 8, collate="packed", fused_step_plan=True),
        workers=4))
    assert len(pool) == len(ref)
    for a, b in zip(pool, ref):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))
