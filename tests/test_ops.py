"""Per-op numeric parity: JAX ops vs a PyTorch restatement of the reference
semantics (SURVEY.md §4 test-pyramid item 1), plus padding-invariance
property tests (item 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch_oracle as oracle
from mpnn_tpu import ops


ATOL = 2e-4  # f32 across different reassociation orders
B, N, NF, EF, MF = 3, 7, 6, 4, 6


def _np(key, shape, scale=1.0):
    return (np.asarray(jax.random.normal(key, shape)) * scale).astype(np.float32)


def make_graph_batch(seed=0, b=B, n=N, nf=NF, ef=EF):
    """Random padded batch: afm masked, bfm/adj symmetric and masked."""
    rs = np.random.RandomState(seed)
    sizes = rs.randint(2, n + 1, size=b)
    mask = np.zeros((b, n, 1), np.float32)
    afm = rs.randn(b, n, nf).astype(np.float32)
    adj = np.zeros((b, n, n), np.float32)
    bfm = np.zeros((b, n, n, ef), np.float32)
    for i, s in enumerate(sizes):
        mask[i, :s] = 1
        afm[i, s:] = 0
        a = (rs.rand(s, s) < 0.4).astype(np.float32)
        a = np.triu(a, 1)
        a = a + a.T
        adj[i, :s, :s] = a
        e = rs.randn(s, s, ef).astype(np.float32)
        e = (e + e.transpose(1, 0, 2)) * a[..., None]
        bfm[i, :s, :s] = e
    return afm, bfm, adj, mask


@pytest.fixture(scope="module")
def batch():
    return make_graph_batch()


# ---------------------------------------------------------------------------
# message functions
# ---------------------------------------------------------------------------

class TestEdgeNetwork:
    def _params(self, tail=5):
        key = jax.random.PRNGKey(0)
        return ops.edge_network_init(key, NF, EF, MF, tail_repeats=tail)

    def _oracle_args(self, p):
        head_ws = [np.asarray(l["w"]) for l in p["head"]]
        head_bs = [np.asarray(l["b"]) for l in p["head"]]
        return (head_ws, head_bs, np.asarray(p["shared"]["w"]),
                np.asarray(p["final"]["w"]), np.asarray(p["final"]["b"]),
                np.asarray(p["message_bias"]))

    def test_fused_matches_reference_block_bmm(self, batch):
        afm, bfm, adj, mask = batch
        p = self._params()
        pen = ops.edge_network_precompute(p, jnp.asarray(bfm), nf=NF, mf=MF,
                                          tail_repeats=5)
        got = ops.edge_network_fused(p, pen, jnp.asarray(afm), nf=NF, mf=MF)
        want = oracle.edge_network_fused(*self._oracle_args(p),
                                         afm, bfm, NF, MF, tail_repeats=5)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)

    def test_tail_repeat_is_weight_shared(self):
        """tail_repeats applications of the SAME matrix (edge_network.py:20)."""
        p = self._params(tail=3)
        e = jnp.ones((2, EF))
        pen3 = ops.edge_network_precompute(p, e, nf=NF, mf=MF, tail_repeats=3)
        # manual: head then shared applied 3x
        x = np.asarray(e)
        for l in p["head"]:
            x = np.maximum(x @ np.asarray(l["w"]) + np.asarray(l["b"]), 0)
        for _ in range(3):
            x = np.maximum(x @ np.asarray(p["shared"]["w"]), 0)
        np.testing.assert_allclose(np.asarray(pen3), x, atol=ATOL)

    def test_head_dims_schedule(self):
        # ef=4, nf*mf=36: 4²=16 < 36 → one squaring layer to 16; 16²=256 ≥ 36.
        dims, pf = ops.message.edge_mlp_head_dims(4, 6, 6)
        assert dims == [(4, 16)] and pf == 16
        # lipo-like: ef=8, nf=mf=23 → 64 ≥ 529? no: 8²=64 < 529 → (8,64); 64²≥529
        dims, pf = ops.message.edge_mlp_head_dims(8, 23, 23)
        assert dims == [(8, 64)] and pf == 64


class TestAttEdgeNetwork:
    def test_matches_oracle(self, batch):
        afm, bfm, adj, mask = batch
        key = jax.random.PRNGKey(1)
        p = ops.att_edge_network_init(key, NF, EF, MF, tail_repeats=4)
        pen = ops.edge_network_precompute(p, jnp.asarray(bfm), nf=NF, mf=MF,
                                          tail_repeats=4)
        got = ops.att_edge_network_apply(p, pen, jnp.asarray(afm),
                                         jnp.asarray(bfm), nf=NF, mf=MF)
        head_ws = [np.asarray(l["w"]) for l in p["head"]]
        head_bs = [np.asarray(l["b"]) for l in p["head"]]
        want = oracle.att_edge_network(
            head_ws, head_bs, np.asarray(p["shared"]["w"]),
            np.asarray(p["final"]["w"]), np.asarray(p["final"]["b"]),
            np.asarray(p["attn"]["w"]), np.asarray(p["attn"]["b"]),
            afm, bfm, NF, MF, tail_repeats=4)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


class TestBilinear:
    def test_matches_oracle(self):
        nf = 2
        ef = nf ** 3
        rs = np.random.RandomState(2)
        afm = rs.randn(2, 5, nf).astype(np.float32)
        bfm = rs.randn(2, 5, 5, ef).astype(np.float32)
        got = ops.bilinear_edge_network_apply(jnp.asarray(afm),
                                              jnp.asarray(bfm), nf=nf)
        want = oracle.bilinear_edge_network(afm, bfm, nf)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


class TestGGNN:
    def test_matches_oracle(self, batch):
        afm, bfm, adj, mask = batch
        n_types = 5
        rs = np.random.RandomState(3)
        types = (rs.randint(1, n_types + 1, size=adj.shape)
                 * adj).astype(np.int32)
        key = jax.random.PRNGKey(4)
        p = ops.ggnn_init(key, NF, n_types, MF)
        got = ops.ggnn_fused(p, jnp.asarray(types), jnp.asarray(afm),
                             nf=NF, mf=MF)
        want = oracle.ggnn_fused(np.asarray(p["adj_w"]),
                                 np.asarray(p["message_bias"]),
                                 afm, types, NF, MF)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


# ---------------------------------------------------------------------------
# aggregators
# ---------------------------------------------------------------------------

class TestAggregators:
    def _messages(self, batch):
        rs = np.random.RandomState(5)
        return rs.randn(B, N, N, MF).astype(np.float32)

    def test_adj(self, batch):
        afm, bfm, adj, mask = batch
        msgs = self._messages(batch)
        got = ops.adj_agg(jnp.asarray(msgs), jnp.asarray(adj))
        np.testing.assert_allclose(np.asarray(got),
                                   oracle.adj_agg(msgs, adj), atol=ATOL)

    def test_wadj(self, batch):
        afm, bfm, adj, mask = batch
        msgs = self._messages(batch)
        got = ops.wadj_agg(jnp.asarray(msgs), jnp.asarray(adj))
        np.testing.assert_allclose(np.asarray(got),
                                   oracle.wadj_agg(msgs, adj), atol=ATOL)

    def test_att(self, batch):
        afm, bfm, adj, mask = batch
        msgs = self._messages(batch)
        p = ops.att_agg_init(jax.random.PRNGKey(6), N)
        got = ops.att_agg(p, jnp.asarray(msgs), jnp.asarray(adj))
        want = oracle.att_agg(np.asarray(p["att"]["w"]),
                              np.asarray(p["att"]["b"]), msgs, adj)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)

    def test_segment_agg_equals_dense_adj_agg(self, batch):
        """CSR/COO ↔ dense equivalence (SURVEY.md §4 property tests)."""
        afm, bfm, adj, mask = batch
        msgs = self._messages(batch)
        dense = oracle.adj_agg(msgs, adj)
        # flatten: node (b, v) → b*N + v; edges where adj==1
        bb, vv, ww = np.nonzero(adj)
        e_msg = msgs[bb, vv, ww]                       # (E, MF)
        e_dst = (bb * N + vv).astype(np.int32)
        got = ops.segment_agg(jnp.asarray(e_msg), jnp.asarray(e_dst),
                              num_nodes=B * N)
        np.testing.assert_allclose(np.asarray(got).reshape(B, N, MF),
                                   dense, atol=ATOL)


# ---------------------------------------------------------------------------
# update / norms / readouts
# ---------------------------------------------------------------------------

class TestGRU:
    def test_matches_oracle(self, batch):
        afm, bfm, adj, mask = batch
        rs = np.random.RandomState(7)
        msgs = rs.randn(B, N, NF).astype(np.float32)
        p = ops.gru_init(jax.random.PRNGKey(8), NF, NF)
        got = ops.gru_apply(p, jnp.asarray(msgs), jnp.asarray(afm),
                            jnp.asarray(mask))
        want = oracle.gru_update(np.asarray(p["w_ih"]), np.asarray(p["w_hh"]),
                                 np.asarray(p["b_ih"]), np.asarray(p["b_hh"]),
                                 msgs, afm, mask)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)

    def test_padded_rows_zero(self, batch):
        afm, bfm, adj, mask = batch
        rs = np.random.RandomState(9)
        msgs = rs.randn(B, N, NF).astype(np.float32)
        p = ops.gru_init(jax.random.PRNGKey(8), NF, NF)
        out = np.asarray(ops.gru_apply(p, jnp.asarray(msgs),
                                       jnp.asarray(afm), jnp.asarray(mask)))
        assert np.all(out[mask[..., 0] == 0] == 0)


class TestNorms:
    def test_stateless(self, batch):
        afm, bfm, adj, mask = batch
        got = ops.mask_batch_norm(jnp.asarray(afm), jnp.asarray(mask))
        want = oracle.mask_batch_norm(afm, mask)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)

    def test_bn1d_train_and_eval(self, batch):
        afm, bfm, adj, mask = batch
        params, state = ops.bn1d_init(NF)
        # non-trivial affine/running state
        params = {"weight": jnp.asarray(np.linspace(0.5, 1.5, NF, dtype=np.float32)),
                  "bias": jnp.asarray(np.linspace(-1, 1, NF, dtype=np.float32))}
        state = {"running_mean": jnp.asarray(np.linspace(-.2, .2, NF, dtype=np.float32)),
                 "running_var": jnp.asarray(np.linspace(.5, 2, NF, dtype=np.float32))}
        for training in (True, False):
            got, new_state = ops.bn1d_apply(params, state, jnp.asarray(afm),
                                            jnp.asarray(mask),
                                            training=training)
            want, rm, rv = oracle.bn1d(
                np.asarray(params["weight"]), np.asarray(params["bias"]),
                np.asarray(state["running_mean"]),
                np.asarray(state["running_var"]),
                afm, mask, training)
            np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)
            if training:
                np.testing.assert_allclose(
                    np.asarray(new_state["running_mean"]), rm, atol=ATOL)
                np.testing.assert_allclose(
                    np.asarray(new_state["running_var"]), rv, atol=ATOL)


class TestReadouts:
    def test_graph_level_output(self, batch):
        afm, bfm, adj, mask = batch
        rs = np.random.RandomState(10)
        x = rs.randn(B, N, 2 * NF).astype(np.float32)
        p = ops.graph_level_output_init(jax.random.PRNGKey(11), NF, 5)
        got = ops.graph_level_output_apply(p, jnp.asarray(x),
                                           jnp.asarray(mask))
        want = oracle.graph_level_output(
            np.asarray(p["i"]["w"]), np.asarray(p["i"]["b"]),
            np.asarray(p["j"]["w"]), np.asarray(p["j"]["b"]), x, mask)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)

    def test_set2vec(self, batch):
        afm, bfm, adj, mask = batch
        rs = np.random.RandomState(12)
        x = rs.randn(B, N, 2 * NF).astype(np.float32)
        p = ops.set2vec_init(jax.random.PRNGKey(13), NF)
        got = ops.set2vec_apply(p, jnp.asarray(x), jnp.asarray(mask),
                                time_steps=7)
        p_np = jax.tree.map(np.asarray, p)
        p_np["q_attn"] = {"w": p_np["q_attn"]["w"]}
        p_np["e_attn"] = {"w": p_np["e_attn"]["w"]}
        want = oracle.set2vec(p_np, x, mask, time_steps=7)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)
        assert got.shape == (B, 4 * NF)

    def test_set2vec_per_graph_softmax_mode(self, batch):
        afm, bfm, adj, mask = batch
        rs = np.random.RandomState(14)
        x = rs.randn(B, N, 2 * NF).astype(np.float32)
        p = ops.set2vec_init(jax.random.PRNGKey(13), NF)
        got = ops.set2vec_apply(p, jnp.asarray(x), jnp.asarray(mask),
                                time_steps=3, batch_softmax=False)
        p_np = jax.tree.map(np.asarray, p)
        want = oracle.set2vec(p_np, x, mask, time_steps=3,
                              batch_softmax=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


class TestPaddingInvariance:
    """Adding padded atoms must not change model-relevant outputs
    (SURVEY.md §4 item 2)."""

    def test_edge_network_fused_padding_invariant(self):
        afm, bfm, adj, mask = make_graph_batch(seed=21, b=2, n=5)
        p = ops.edge_network_init(jax.random.PRNGKey(0), NF, EF, MF,
                                  tail_repeats=3)

        def run(afm_, bfm_, n_):
            pen = ops.edge_network_precompute(p, jnp.asarray(bfm_), nf=NF,
                                              mf=MF, tail_repeats=3)
            return np.asarray(ops.edge_network_fused(
                p, pen, jnp.asarray(afm_), nf=NF, mf=MF))

        small = run(afm, bfm, 5)
        # pad to 9 atoms
        afm2 = np.zeros((2, 9, NF), np.float32); afm2[:, :5] = afm
        bfm2 = np.zeros((2, 9, 9, EF), np.float32); bfm2[:, :5, :5] = bfm
        big = run(afm2, bfm2, 9)
        # Padded (zero-feature) pairs contribute A(0)·h_w, but padded h_w = 0,
        # so real-node messages are unchanged. Bias leakage only enters via
        # real nodes' zero-feature pairs, identical in both paddings.
        np.testing.assert_allclose(big[:, :5], small, atol=ATOL)


class TestSet2VecDotMode:
    def test_dot_inner_product(self, batch):
        """'dot' inner-product variant (set2vec.py:86-90,129-134); the
        reference's masked dot path has a broken broadcast, so the oracle
        here is the sane per-(B,N) mask application."""
        afm, bfm, adj, mask = batch
        rs = np.random.RandomState(15)
        x = rs.randn(B, N, 2 * NF).astype(np.float32)
        p = ops.set2vec_init(jax.random.PRNGKey(16), NF, inner_prod="dot")
        out = ops.set2vec_apply(p, jnp.asarray(x), jnp.asarray(mask),
                                time_steps=3, inner_prod="dot")
        assert out.shape == (B, 4 * NF)
        assert bool(jnp.isfinite(out).all())

    def test_invalid_mode_rejected(self):
        with pytest.raises(ValueError, match="Invalid inner_prod"):
            ops.set2vec_init(jax.random.PRNGKey(0), 4, inner_prod="bogus")
