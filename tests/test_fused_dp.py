"""Data-parallel whole-step fused kernel (parallel/fused_dp.py) on the
virtual CPU mesh: the DP step must equal the count-weighted combination
of independent single-device fused steps (local-BN semantics), with
running-stat EMAs folded from the EXACT global batch moments."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow

from mpnn_tpu import graphs as G
from mpnn_tpu import models
from mpnn_tpu.models.fused_train import (_build_a_form,
                                         make_fused_step_for_batch)
from mpnn_tpu.models.sparse import fold_recurrence_emas
from mpnn_tpu.parallel import mesh as mesh_mod
from mpnn_tpu.parallel.fused_dp import (make_fused_dp_train_step,
                                        plan_shard_windows, put_superbatch,
                                        shard0_view, split_statics,
                                        stack_shards)

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
          "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
          "OC(=O)c1ccccc1O"]


def _make_shards(n_shards=2, per=6, node_cap=128, edge_cap=256):
    rng = np.random.RandomState(7)
    mols = [SMILES[i % len(SMILES)] for i in range(n_shards * per)]
    gs = G.generate_molgraphs(mols, list(range(len(mols))))
    gs, ge = G.encode_molgraphs(gs)
    shards = []
    for i in range(n_shards):
        chunk = gs[i * per:(i + 1) * per]
        packed = G.collate_packed(chunk, node_cap=node_cap,
                                  edge_cap=edge_cap, num_graphs=per).as_dict()
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
        packed["node_feats"] = np.concatenate(
            [packed["node_feats"], packed["node_nafm"]], axis=-1)
        packed["labels"] = rng.randn(per).astype(np.float32)
        shards.append(packed)
    return shards, ge


def _cfg(ge):
    nf = ge.atom_width() + 3
    return models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=5, message_steps=3,
        msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=3)


def _single_device_pieces(cfg, params, shard):
    """Per-shard fused loss/grads/stats via the single-device op (the
    oracle the DP step's count-weighted combination must reproduce)."""
    jb = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
          for k, v in shard.items()}
    labels = jb.pop("labels")
    op = make_fused_step_for_batch(cfg, shard, interpret=True)

    def lf(p):
        h0 = jb["node_feats"] * jb["node_mask"]
        amat, a0, vid = _build_a_form(p, cfg, jb)
        loss, out, ma_stats, step_stats = op(
            amat, a0, p["message"][0]["message_bias"], h0,
            jb["node_mask"], jb["node_graph"], p["gru"],
            p["ma_bn"][0], p["bn"][0], p["readout"], labels,
            jb["graph_mask"], vid, jb["edge_src"], jb["edge_dst"],
            jb["fs_win"], jb["fs_ns"])
        return loss, (out, ma_stats, step_stats)

    (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
    cnt = float(np.asarray(shard["graph_mask"]).sum())
    ncnt = float(np.asarray(shard["node_mask"]).sum())
    return loss, grads, aux, cnt, ncnt


class TestFusedDP:
    def _setup(self, n_shards):
        shards, ge = _make_shards(n_shards=n_shards)
        shards = plan_shard_windows(shards, block_edges=128)
        assert shards is not None
        cfg = _cfg(ge)
        params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
        sup = stack_shards(shards)
        return cfg, params, state, shards, sup

    def test_dp_matches_weighted_single_device(self):
        n_shards = 2
        cfg, params, state, shards, sup = self._setup(n_shards)
        mesh = mesh_mod.make_mesh(data=n_shards,
                                  devices=jax.devices()[:n_shards])
        arrays, _ = split_statics(sup)

        lr = 1.0   # SGD(1.0): params_old - params_new == grads
        step = make_fused_dp_train_step(cfg, optax.sgd(lr), mesh, sup,
                                        interpret=True)
        loss, p2, s2, _, out = step(params, state, optax.sgd(lr).init(params),
                                    put_superbatch(mesh, arrays))

        # oracle: independent per-shard fused steps, count-weighted
        pieces = [_single_device_pieces(cfg, params, b) for b in shards]
        total = sum(c for *_, c, _n in pieces)
        exp_loss = sum(float(l) * c for l, _, _, c, _n in pieces) / total
        np.testing.assert_allclose(float(loss), exp_loss, rtol=2e-5)

        ws = [p[3] / total for p in pieces]
        exp_grads = jax.tree.map(
            lambda *gs: sum(g * w for g, w in zip(gs, ws)),
            *[p[1] for p in pieces])
        got_grads = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                                 params, p2)
        flat_e, te = jax.tree.flatten(exp_grads)
        flat_g, tg = jax.tree.flatten(got_grads)
        assert te == tg
        for i, (xe, xg) in enumerate(zip(flat_e, flat_g)):
            np.testing.assert_allclose(np.asarray(xg), np.asarray(xe),
                                       rtol=2e-4, atol=1e-6,
                                       err_msg=f"grad leaf {i}")

        # per-shard readouts concatenated in device order
        outs = np.concatenate([np.asarray(p[2][0]) for p in pieces])
        np.testing.assert_allclose(np.asarray(out), outs, rtol=2e-5,
                                   atol=1e-6)

        # EMAs: folded from the EXACT global moments (count-weighted
        # E[x] / E[x²] combine of the per-shard local stats)
        ntotal = sum(p[4] for p in pieces)

        def comb(stats_list):
            ms = np.stack([np.asarray(m) for m, _ in stats_list])
            vs = np.stack([np.asarray(v) for _, v in stats_list])
            w = np.array([p[4] for p in pieces])[:, None] / ntotal
            gm = (ms * w).sum(0)
            ex2 = ((vs + ms * ms) * w).sum(0)
            return gm, ex2 - gm * gm

        ma_g = comb([p[2][1] for p in pieces])
        st_g = [comb([p[2][2][t] for p in pieces])
                for t in range(cfg.message_steps)]
        ma_exp, bn_exp = fold_recurrence_emas(
            state["ma_bn"][0], state["bn"][0], cfg.message_steps, ma_g, st_g)
        for field in ("running_mean", "running_var"):
            np.testing.assert_allclose(
                np.asarray(s2["ma_bn"][0][field]), ma_exp[field],
                rtol=2e-4, atol=1e-7, err_msg=f"ma_bn.{field}")
            np.testing.assert_allclose(
                np.asarray(s2["bn"][0][field]), bn_exp[field],
                rtol=2e-4, atol=1e-7, err_msg=f"bn.{field}")

    def test_four_way(self):
        n_shards = 4
        cfg, params, state, shards, sup = self._setup(n_shards)
        mesh = mesh_mod.make_mesh(data=n_shards,
                                  devices=jax.devices()[:n_shards])
        arrays, _ = split_statics(sup)
        tx = optax.adam(1e-3)
        step = make_fused_dp_train_step(cfg, tx, mesh, sup, interpret=True)
        loss, p2, s2, o2, out = step(params, state, tx.init(params),
                                     put_superbatch(mesh, arrays))
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(np.asarray(out)))
        # second step runs from the updated carry
        loss2, *_ = step(p2, s2, o2, put_superbatch(mesh, arrays))
        assert np.isfinite(float(loss2))

    def test_stack_shards_rejects_mismatch(self):
        shards, _ = _make_shards(n_shards=2)
        shards = plan_shard_windows(shards, block_edges=128)
        bad = dict(shards[1])
        bad["fs_window"] = int(bad["fs_window"]) + 128
        with pytest.raises(ValueError):
            stack_shards([shards[0], bad])


def _cfg_psteps(ge):
    """The encoded-family shape (per-step message weights + per-step bn1d
    pairs + frozen AEs + input norm)."""
    return models.MPNNConfig(
        node_features=8, edge_features=2, message_features=8,
        atom_encoder="atom_ae", atom_encoder_in=ge.atom_width(),
        bond_encoder="bond_ae", bond_encoder_in=ge.bond_width(),
        input_norm=True, output_dim=5, message_steps=2,
        share_message_weights=False, per_step_norms=True,
        msg_norm="bn1d", state_norm="bn1d", edge_mlp_tail_repeats=2)


def _cfg_att(ge):
    """The att_model shape (per-step gated messages, stateless BN,
    evolving state, graph-level readout for a scalar-friendly out)."""
    nf = ge.atom_width() + 3
    return models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=5,
        message_fn="att_edge_network", aggregation="adj",
        share_message_weights=False, update_hidden="state",
        state_norm="stateless", message_steps=2,
        edge_mlp_tail_repeats=2)


class TestFusedDPFamilies:
    """Round-3 VERDICT item 3: the att and psteps kernels compose with
    multi-chip DP, and serving gets a sharded fused_eval step."""

    def _shards_and_sup(self, n_shards=2):
        shards, ge = _make_shards(n_shards=n_shards)
        shards = plan_shard_windows(shards, block_edges=128)
        assert shards is not None
        return shards, ge

    def test_psteps_dp_step(self):
        """Encoded-family DP: per-step BN EMAs fold the exact global
        moments; loss is the count-weighted mean; input BN cross-replica.
        Oracle: per-shard single-device glue, count-weighted."""
        from mpnn_tpu.models.fused_train import (_bn_params_list_or_dummy,
                                                 _build_a_form_psteps,
                                                 _input_transforms)
        shards, ge = self._shards_and_sup()
        cfg = _cfg_psteps(ge)
        # drop the folded-nafm widening (encoded path eats raw afm)
        for b in shards:
            b["node_feats"] = b["node_feats"][:, :ge.atom_width()]
        params, state = models.mpnn_init(jax.random.PRNGKey(5), cfg)
        sup = stack_shards(shards)
        arrays, _ = split_statics(sup)
        mesh = mesh_mod.make_mesh(data=2, devices=jax.devices()[:2])
        tx = optax.sgd(1.0)
        step = make_fused_dp_train_step(cfg, tx, mesh, sup,
                                        interpret=True)
        loss, p2, s2, _, out = step(params, state, tx.init(params),
                                    put_superbatch(mesh, arrays))
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(np.asarray(out)))
        # per-step EMAs advanced (exactly one update per norm)
        for t in range(cfg.message_steps):
            assert not np.allclose(
                np.asarray(s2["ma_bn"][t]["running_mean"]),
                np.asarray(state["ma_bn"][t]["running_mean"]))
        # input-BN state advanced identically across the replicated spec
        assert not np.allclose(np.asarray(s2["aebn"]["running_mean"]),
                               np.asarray(state["aebn"]["running_mean"]))
        # second step from the carry
        loss2, *_ = step(p2, s2, tx.init(p2), put_superbatch(mesh, arrays))
        assert np.isfinite(float(loss2))

    def test_att_dp_step_matches_weighted_single_device(self):
        from mpnn_tpu.models.fused_train import (fused_mpnn_out,
                                                 make_fused_step_for_batch)
        shards, ge = self._shards_and_sup()
        cfg = _cfg_att(ge)
        params, state = models.mpnn_init(jax.random.PRNGKey(6), cfg)
        sup = stack_shards(shards)
        arrays, _ = split_statics(sup)
        mesh = mesh_mod.make_mesh(data=2, devices=jax.devices()[:2])
        tx = optax.sgd(1.0)
        step = make_fused_dp_train_step(cfg, tx, mesh, sup,
                                        interpret=True)
        loss, p2, _, _, out = step(params, state, tx.init(params),
                                   put_superbatch(mesh, arrays))

        # oracle: per-shard fused glue, count-weighted
        losses, grads_l, cnts, outs = [], [], [], []
        for b in shards:
            jb = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                  for k, v in b.items()}
            labels = jb.pop("labels")
            op = make_fused_step_for_batch(cfg, b, interpret=True)

            def lf(p):
                o, _ = fused_mpnn_out(p, state, cfg, jb, op)
                per = ((o - labels[:, None]) ** 2) \
                    * jb["graph_mask"][:, None]
                return per.sum() / jb["graph_mask"].sum(), o

            (l, o), g = jax.value_and_grad(lf, has_aux=True)(params)
            losses.append(float(l))
            grads_l.append(g)
            cnts.append(float(np.asarray(b["graph_mask"]).sum()))
            outs.append(np.asarray(o))
        total = sum(cnts)
        exp_loss = sum(l * c for l, c in zip(losses, cnts)) / total
        np.testing.assert_allclose(float(loss), exp_loss, rtol=3e-5)
        ws = [c / total for c in cnts]
        exp_grads = jax.tree.map(
            lambda *gs: sum(g * w for g, w in zip(gs, ws)), *grads_l)
        got_grads = jax.tree.map(
            lambda a, b_: np.asarray(a) - np.asarray(b_), params, p2)
        fe, te = jax.tree.flatten(exp_grads)
        fg, tg = jax.tree.flatten(got_grads)
        assert te == tg
        for i, (xe, xg) in enumerate(zip(fe, fg)):
            np.testing.assert_allclose(np.asarray(xg), np.asarray(xe),
                                       rtol=5e-4, atol=2e-6,
                                       err_msg=f"grad leaf {i}")
        np.testing.assert_allclose(np.asarray(out),
                                   np.concatenate(outs), rtol=2e-4,
                                   atol=1e-6)

    def test_fused_eval_dp(self):
        """Sharded serving: the DP eval step equals per-shard
        single-device fused_mpnn_eval, concatenated in device order."""
        from mpnn_tpu.models.fused_train import (fused_mpnn_eval,
                                                 make_fused_eval_for_batch)
        from mpnn_tpu.parallel.fused_dp import make_fused_dp_eval_step
        shards, ge = self._shards_and_sup()
        cfg = _cfg(ge)
        params, state = models.mpnn_init(jax.random.PRNGKey(7), cfg)
        sup = stack_shards(shards)
        arrays, _ = split_statics(sup)
        mesh = mesh_mod.make_mesh(data=2, devices=jax.devices()[:2])
        estep = make_fused_dp_eval_step(cfg, mesh, sup, interpret=True)
        out = estep(params, state, put_superbatch(mesh, arrays))
        outs = []
        for b in shards:
            jb = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                  for k, v in b.items()}
            jb.pop("labels")
            ev = make_fused_eval_for_batch(cfg, b, interpret=True)
            outs.append(np.asarray(
                fused_mpnn_eval(params, state, cfg, jb, ev)))
        np.testing.assert_allclose(np.asarray(out),
                                   np.concatenate(outs), rtol=2e-4,
                                   atol=1e-6)


class TestBilinearDP:
    def test_bilinear_dp_matches_weighted_single_device(self):
        """Round 5: the bilinear family (kernels/fused_bilinear.py) under
        fused DP — loss = count-weighted per-shard masked MSE, readouts
        concatenated in device order (no norms → no cross-device
        stats)."""
        from mpnn_tpu.models.fused_train import (fused_bilinear_out,
                                                 fused_step_eligible)
        n_shards = 2
        per = 6
        rng = np.random.RandomState(7)
        mols = [SMILES[i % len(SMILES)] for i in range(n_shards * per)]
        gs = G.generate_molgraphs(mols, list(range(len(mols))))
        gs, ge = G.encode_molgraphs(gs)
        shards = []
        for i in range(n_shards):
            packed = G.collate_packed(gs[i * per:(i + 1) * per],
                                      node_cap=128, edge_cap=256,
                                      num_graphs=per).as_dict()
            ef = np.asarray(packed["edge_feats"])
            ef = np.pad(ef, ((0, 0), (0, max(0, 8 - ef.shape[-1]))))
            packed["edge_feats"] = ef[:, :8]
            packed["node_feats"] = np.concatenate(
                [packed["node_feats"], packed["node_nafm"]],
                axis=-1)[:, :2]
            packed = G.attach_edge_vocab(packed, vocab_cap=16)
            packed["labels"] = rng.randn(per).astype(np.float32)
            shards.append(packed)
        shards = plan_shard_windows(shards, block_edges=128)
        assert shards is not None
        cfg = models.MPNNConfig(
            node_features=2, edge_features=8, message_features=2,
            output_dim=32, message_fn="bilinear", aggregation="adj",
            message_steps=2, message_input="state",
            update_hidden="initial", concat_state_history=True)
        params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
        assert fused_step_eligible(cfg, shard0_view(stack_shards(shards)),
                                   training=True)
        sup = stack_shards(shards)
        mesh = mesh_mod.make_mesh(data=n_shards,
                                  devices=jax.devices()[:n_shards])
        arrays, _ = split_statics(sup)
        step = make_fused_dp_train_step(cfg, optax.sgd(1.0), mesh, sup,
                                        interpret=True)
        loss, p2, _, _, out = step(params, state,
                                   optax.sgd(1.0).init(params),
                                   put_superbatch(mesh, arrays))

        # oracle: per-shard single-device fused losses, count-weighted
        exp_losses, outs, cnts = [], [], []
        for b in shards:
            jb = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                  for k, v in b.items()}
            labels = jb.pop("labels")
            op = make_fused_step_for_batch(cfg, b, interpret=True)
            o, _ = fused_bilinear_out(params, state, cfg, jb, op)
            gm = jb["graph_mask"][:, None]
            per_ = ((o - labels[:, None]) ** 2) * gm
            exp_losses.append(float(per_.sum() / gm.sum()))
            outs.append(np.asarray(o))
            cnts.append(float(np.asarray(b["graph_mask"]).sum()))
        total = sum(cnts)
        exp = sum(l * c for l, c in zip(exp_losses, cnts)) / total
        np.testing.assert_allclose(float(loss), exp, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(out),
                                   np.concatenate(outs), rtol=2e-5,
                                   atol=1e-6)
