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
