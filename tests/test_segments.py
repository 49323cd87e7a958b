"""Scatter-free segment reductions (ops/segments.py): the slot-table path
must reproduce jax.ops.segment_sum / gather numerics exactly (up to float
reassociation) in BOTH directions (forward + VJP), standalone and through
the full sparse model.

Reference semantics being preserved: the torch scatter-add aggregation used
throughout /root/reference/mpnn_functions/ (e.g. graph_level_output.py,
set2vec.py) — slot tables are a TPU-side rewrite of HOW the same sums are
computed, never WHAT they compute."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu import graphs as G
from mpnn_tpu import models
from mpnn_tpu.models.sparse import sparse_mpnn_apply
from mpnn_tpu.ops.segments import (
    SegmentSlots, attach_segment_slots, plan_slots, slot_gather,
    slot_segment_sum,
)

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1"]


def setup_graphs():
    gs = G.generate_molgraphs(SMILES, list(range(len(SMILES))))
    gs, ge = G.encode_molgraphs(gs)
    return gs, ge


def mpnn_cfg(ge, **kw):
    nf = ge.atom_width()
    defaults = dict(node_features=nf, edge_features=ge.bond_width(),
                    message_features=nf, output_dim=8, message_steps=3,
                    edge_mlp_tail_repeats=4)
    defaults.update(kw)
    return models.MPNNConfig(**defaults)


def packed_pair(gs):
    """(plain, with-slots) jnp batch dicts from the same packed batch."""
    packed = G.collate_packed(gs).as_dict()
    slotted = attach_segment_slots(packed)
    to_j = lambda d: {k: jnp.asarray(v) if not np.isscalar(v) else v
                      for k, v in d.items()}
    return to_j(packed), to_j(slotted)


# ---------------------------------------------------------------------------
# unit: planner + ops vs the scatter primitives
# ---------------------------------------------------------------------------

def test_plan_slots_inverts_segment_ids():
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 12, size=40).astype(np.int32)
    ids[rs.rand(40) < 0.2] = 12          # out-of-range → dropped
    slots, smask = plan_slots(ids, 12)
    # every kept position appears exactly once, in its own segment's row
    seen = []
    for s in range(12):
        for j in range(slots.shape[1]):
            if smask[s, j]:
                assert ids[slots[s, j]] == s
                seen.append(int(slots[s, j]))
    assert sorted(seen) == sorted(np.nonzero(ids < 12)[0].tolist())


def test_plan_slots_cap_overflow_returns_none():
    ids = np.zeros(9, np.int32)           # 9 members in segment 0
    assert plan_slots(ids, 4, cap=8) is None
    slots, smask = plan_slots(ids, 4, cap=16)
    assert slots.shape == (4, 16) and smask.sum() == 9


def test_slot_segment_sum_matches_scatter_fwd_and_bwd():
    rs = np.random.RandomState(1)
    P, S, f = 57, 9, 5
    ids = rs.randint(0, S + 1, size=P).astype(np.int32)   # S = padding id
    x = rs.randn(P, f).astype(np.float32)
    valid = (ids < S).astype(np.float32)
    slots, smask = plan_slots(ids, S)

    ref = jax.ops.segment_sum(jnp.asarray(x), jnp.asarray(ids),
                              num_segments=S + 1)[:-1]
    got = slot_segment_sum(jnp.asarray(x), jnp.asarray(slots),
                           jnp.asarray(smask), jnp.asarray(ids),
                           jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    co = rs.randn(S, f).astype(np.float32)
    g_ref = jax.grad(lambda v: (jax.ops.segment_sum(
        v, jnp.asarray(ids), num_segments=S + 1)[:-1] * co).sum())(
            jnp.asarray(x))
    g_got = jax.grad(lambda v: (slot_segment_sum(
        v, jnp.asarray(slots), jnp.asarray(smask), jnp.asarray(ids),
        jnp.asarray(valid)) * co).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-6)


def test_slot_gather_matches_indexing_fwd_and_bwd():
    rs = np.random.RandomState(2)
    P, S, f = 33, 7, 4
    idx = rs.randint(0, S + 1, size=P).astype(np.int32)
    valid = (idx < S).astype(np.float32)
    r = rs.randn(S, f).astype(np.float32)
    slots, smask = plan_slots(idx, S)

    # reference: gather with an appended zero sentinel row (what the
    # scatter path computes for padded positions)
    r_ext = jnp.concatenate([jnp.asarray(r), jnp.zeros((1, f))], axis=0)
    ref = r_ext[jnp.asarray(idx)]
    got = slot_gather(jnp.asarray(r), jnp.asarray(idx), jnp.asarray(valid),
                      jnp.asarray(slots), jnp.asarray(smask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    co = rs.randn(P, f).astype(np.float32)
    g_ref = jax.grad(lambda v: (jnp.concatenate(
        [v, jnp.zeros((1, f))], axis=0)[jnp.asarray(idx)] * co).sum())(
            jnp.asarray(r))
    g_got = jax.grad(lambda v: (slot_gather(
        v, jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(slots),
        jnp.asarray(smask)) * co).sum())(jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-6)


def test_hlo_has_no_scatter():
    """The whole point: neither direction of the slot ops lowers to scatter."""
    rs = np.random.RandomState(3)
    ids = rs.randint(0, 6, size=20).astype(np.int32)
    x = jnp.asarray(rs.randn(20, 3).astype(np.float32))
    slots, smask = plan_slots(ids, 6)
    args = (jnp.asarray(slots), jnp.asarray(smask), jnp.asarray(ids),
            jnp.ones(20, np.float32))

    def f(v):
        return slot_segment_sum(v, *args).sum()
    txt = jax.jit(jax.grad(f)).lower(x).as_text()
    assert "scatter" not in txt


# ---------------------------------------------------------------------------
# integration: full sparse model, slots vs scatter — forward + grads
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cfg_kw", [
    dict(msg_norm="bn1d", state_norm="bn1d", message_steps=6),  # flagship
    dict(),                                                     # basic
    dict(message_fn="att_edge_network", aggregation="att",
         readout="set2vec", set2vec_steps=4),                   # adv family
    dict(message_fn="att_edge_network", aggregation="adj",
         readout="set2vec", set2vec_steps=4,
         set2vec_batch_softmax=False),
])
@pytest.mark.slow
def test_model_parity_slots_vs_scatter(cfg_kw):
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, **cfg_kw)
    params, state = models.mpnn_init(jax.random.PRNGKey(11), cfg)
    plain, slotted = packed_pair(gs)
    assert "gslots" in slotted and "dslots" in slotted

    def loss(p, b):
        out, ns = sparse_mpnn_apply(p, state, cfg, b, training=True)
        return (out ** 2).sum(), (out, ns)

    (l0, (o0, s0)), g0 = jax.value_and_grad(loss, has_aux=True)(
        params, plain)
    (l1, (o1, s1)), g1 = jax.value_and_grad(loss, has_aux=True)(
        params, slotted)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4), g0, g1)
    # BN running stats identical too
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), s0, s1)


@pytest.mark.slow
def test_model_parity_slots_with_vocab():
    """Slots compose with the edge-vocab dedup (the bench configuration)."""
    gs, ge = setup_graphs()
    cfg = mpnn_cfg(ge, msg_norm="bn1d", state_norm="bn1d", message_steps=6)
    params, state = models.mpnn_init(jax.random.PRNGKey(12), cfg)
    packed = G.collate_packed(gs).as_dict()
    packed = G.attach_edge_vocab(packed, vocab_cap=16)
    slotted = attach_segment_slots(packed)
    to_j = lambda d: {k: jnp.asarray(v) if not np.isscalar(v) else v
                      for k, v in d.items()}
    plain, slotted = to_j(packed), to_j(slotted)

    def loss(p, b):
        out, _ = sparse_mpnn_apply(p, state, cfg, b, training=True)
        return (out ** 2).sum()

    g0 = jax.grad(loss)(params, plain)
    g1 = jax.grad(loss)(params, slotted)
    np.testing.assert_allclose(loss(params, plain), loss(params, slotted),
                               rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4), g0, g1)


def test_loader_attaches_fixed_shape_slots():
    gs, ge = setup_graphs()
    from mpnn_tpu.graphs.dataloader import GraphLoader
    loader = GraphLoader(gs * 3, batch_size=5, collate="packed",
                         shuffle=True, use_native=False,
                         segment_slots=True)
    shapes = set()
    for batch in loader:
        assert {"gslots", "gslot_mask", "dslots", "dslot_mask",
                "sslots", "sslot_mask"} <= set(batch)
        shapes.add((batch["gslots"].shape[1], batch["dslots"].shape[1]))
        # slot tables must invert the batch's own indices
        ng = batch["graph_mask"].shape[0]
        for s in range(ng):
            for j in range(batch["gslots"].shape[1]):
                if batch["gslot_mask"][s, j]:
                    assert batch["node_graph"][batch["gslots"][s, j]] == s
    assert len(shapes) == 1              # ONE compiled shape per run


def test_segment_slots_fallback_without_tables():
    """A batch without tables routes every call site to the scatter path."""
    gs, _ = setup_graphs()
    packed = G.collate_packed(gs).as_dict()
    s = SegmentSlots({k: jnp.asarray(v) for k, v in packed.items()})
    assert not s.has_graph and not s.has_edges
