"""Native packer parity + speed sanity vs the numpy collators."""

import numpy as np
import pytest

from mpnn_tpu import graphs as G
from mpnn_tpu import native

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1"]


@pytest.fixture(scope="module")
def gs():
    graphs = G.generate_molgraphs(SMILES, [0.1 * i
                                           for i in range(len(SMILES))])
    graphs, _ = G.encode_molgraphs(graphs)
    return graphs


@pytest.mark.skipif(not native.available(), reason="g++ build unavailable")
class TestNativePacker:
    def test_packed_parity(self, gs):
        ref = G.collate_packed(gs, node_cap=128, edge_cap=256).as_dict()
        got = native.pack_batch_native(gs, node_cap=128, edge_cap=256)
        for k, v in ref.items():
            if k == "num_graphs":
                assert got[k] == v
                continue
            np.testing.assert_array_equal(got[k], v, err_msg=k)

    def test_dense_parity(self, gs):
        ref = G.collate_dense(gs, num_nodes=32)
        got = native.pack_dense_native(gs, n_cap=32)
        for k in ("afm", "nafm", "bfm", "adj", "mask", "labels"):
            np.testing.assert_allclose(got[k], ref[k], err_msg=k, atol=0)

    def test_capacity_errors(self, gs):
        with pytest.raises(ValueError):
            native.pack_batch_native(gs, node_cap=8, edge_cap=8)
        with pytest.raises(ValueError):
            native.pack_dense_native(gs, n_cap=4)

    def test_too_few_graph_slots_rejected(self, gs):
        # graph_mask is (num_graphs,): num_graphs < len(graphs) would be an
        # out-of-bounds write in C (the numpy fallback raises IndexError)
        with pytest.raises((AssertionError, ValueError)):
            native.pack_batch_native(gs, node_cap=128, edge_cap=256,
                                     num_graphs=len(gs) - 1)

    def test_faster_than_numpy_on_large_batch(self, gs):
        import time
        big = gs * 64     # 448 graphs
        t0 = time.perf_counter()
        for _ in range(5):
            G.collate_packed(big, node_cap=8192, edge_cap=16384)
        t_np = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            native.pack_batch_native(big, node_cap=8192, edge_cap=16384)
        t_nat = time.perf_counter() - t0
        # don't be flaky: just require the native path is not slower
        assert t_nat < t_np * 1.2, (t_nat, t_np)


def test_flat_store_gather_matches_numpy_loader():
    """The native gather-packer (dataset-wide FlatStore, one C++ memcpy
    pass per batch incl. vocab ids and GGNN types) must reproduce the
    numpy loader bit-for-bit, including the derived plan keys."""
    import numpy as np
    from mpnn_tpu import graphs as G
    from mpnn_tpu import native
    from mpnn_tpu.graphs.dataloader import GraphLoader
    if not native.available():
        import pytest
        pytest.skip("native packer unavailable")
    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "C1CCCCC1",
              "NC(=O)c1ccccc1", "CC(C)Cc1ccc(cc1)C(C)C(=O)O"] * 5
    gs = G.generate_molgraphs(smiles, [0.1 * i for i in range(len(smiles))])
    G.attach_edge_types(gs)
    gs, _ = G.encode_molgraphs(gs)
    l_flat = GraphLoader(gs, 8, collate="packed", fused_step_plan=True)
    l_np = GraphLoader(gs, 8, collate="packed", use_native=False,
                       fused_step_plan=True)
    assert l_flat._flat_store is not None
    a_all, b_all = list(l_flat), list(l_np)
    assert len(a_all) == len(b_all)
    for a, b in zip(a_all, b_all):
        assert set(a) == set(b)
        assert "edge_vid" in a and "edge_types" in a
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)
