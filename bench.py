"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures edge-message throughput of the flagship (lipo-config) TRAINING step
— forward + backward + Adam — on the packed sparse path:

    edges/s = real_edges × message_steps × iters / elapsed

The baseline is the dense PyTorch restatement of the reference semantics
(scripts/measure_baseline_torch.py) measured on this container's CPU and
recorded in BASELINE.md; the reference publishes no numbers of its own
(BASELINE.md), so the baseline is measured, not quoted.

Measurement honesty (the round-1 numbers were inflated ~800× by the
remote-execution tunnel returning before device completion / replaying
repeated identical dispatches — see BASELINE.md "round-2 correction"):
  * every dispatch gets a DIFFERENT input (the iteration index perturbs the
    labels), so no request can be served from a replay cache;
  * timing ends with jax.device_get of the final loss (a host copy cannot
    complete before the compute that produces it);
  * the final loss is checked finite and the per-step latency is printed to
    stderr so a physically impossible number is visible at a glance.

Flags: --mode sparse|dense, --batch N, --iters N, --dtype, --no-vocab.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# measured via scripts/measure_baseline_torch.py (dense reference semantics,
# torch CPU, this container, batch 256×~26 edges, 2.78 s/step) — BASELINE.md
BASELINE_EDGE_MSGS_PER_S = 14386.3

SMILES = [
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",          # ibuprofen
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",        # caffeine
    "CC(=O)Oc1ccccc1C(=O)O",               # aspirin
    "c1ccc2c(c1)cccc2O",                   # naphthol
    "CCN(CC)CCNC(=O)c1ccc(N)cc1",          # procainamide
    "NC(=O)c1ccccc1", "OC(=O)c1ccccc1O", "c1ccncc1CCO",
    "CC(C)(C)NCC(O)c1ccc(O)c(CO)c1",       # salbutamol
    "ClC1=CC=CC=C1C(=O)NCCN",
]


def build_batch(batch_size: int, edge_types: bool = False):
    from mpnn_tpu import graphs as G
    smiles = (SMILES * (batch_size // len(SMILES) + 1))[:batch_size]
    gs = G.generate_molgraphs(smiles, [0.1 * i for i in range(len(smiles))])
    if edge_types:
        G.attach_edge_types(gs)       # needs RAW bond features (pre-encode)
    gs, ge = G.encode_molgraphs(gs)
    return gs, ge


def flagship_mpnn_cfg(ge):
    from mpnn_tpu import models
    nf = ge.atom_width() + 3     # afm + nafm, as the lipo wrapper feeds it
    return models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=2 * ge.atom_width(),
        message_steps=6, msg_norm="bn1d", state_norm="bn1d",
        edge_mlp_tail_repeats=50)


def att_mpnn_cfg(ge):
    """Attention family (test_adv.py semantics: AttEdgeNetwork + att
    aggregation + set2vec readout, update hidden = initial)."""
    from mpnn_tpu import models
    nf = ge.atom_width() + 3
    return models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=4 * nf,
        message_fn="att_edge_network", aggregation="att",
        readout="set2vec", set2vec_steps=12, update_hidden="initial",
        message_steps=3, edge_mlp_tail_repeats=50)


def encoded_mpnn_cfg(ge):
    """Encoded family (normed_encoded_basic_model semantics: frozen AEs
    compress the input widths, input BN, PER-STEP message weights +
    per-step bn1d pairs) — rides the per-step whole-step kernel
    (kernels/fused_psteps.py)."""
    from mpnn_tpu import models
    enc = 8
    return models.MPNNConfig(
        node_features=enc, edge_features=2, message_features=enc,
        output_dim=2 * enc, message_steps=3,
        share_message_weights=False, per_step_norms=True,
        msg_norm="bn1d", state_norm="bn1d",
        atom_encoder="atom_ae", atom_encoder_in=ge.atom_width() + 3,
        bond_encoder="bond_ae", bond_encoder_in=ge.bond_width(),
        input_norm=True, edge_mlp_tail_repeats=50)


ECFP_BITS = 16384     # reference Morgan width (load_dataset.py:112-120)


def shim_bilinear_widths(packed, cfg):
    """The bilinear family's width-coherence shim, in ONE place (also
    used by scripts/sol_accounting.py): pad/slice the real encoded edge
    features to ef == nf³ (ops/message.py coherence) and truncate the
    node features to the config's nf — a synthetic-width THROUGHPUT
    shape (the reference feeds encoder-compressed widths here,
    basic_model_ecfp.py:53-54). Call BEFORE attach_edge_vocab (the vocab
    must index the shimmed rows) and handles node_nafm concat itself."""
    import numpy as np
    nf3 = cfg.node_features ** 3
    ef = np.asarray(packed["edge_feats"])
    if ef.shape[-1] < nf3:
        ef = np.pad(ef, ((0, 0), (0, nf3 - ef.shape[-1])))
    packed["edge_feats"] = ef[:, :nf3]
    packed["node_feats"] = np.concatenate(
        [packed["node_feats"], packed["node_nafm"]],
        axis=-1)[:, :cfg.node_features]
    return packed


def encoded_ecfp_mpnn_cfg(ge):
    """encoded_ecfp family (normed_encoded_basic_model_ecfp semantics:
    encoded core with per-step message weights + per-step msg BNs, NO
    state norm, output BN, 32-wide readout; the Linear(32, 16384) head +
    sigmoid-MSE against per-ATOM bit labels run in XLA around the psteps
    kernel). Per-atom bits are node-space labels (collate_packed
    node_labels) — the packed loss gathers each node's graph output."""
    from mpnn_tpu import models
    enc = 8
    return models.MPNNConfig(
        node_features=enc, edge_features=2, message_features=enc,
        output_dim=32, message_steps=3,
        share_message_weights=False, per_step_norms=True,
        msg_norm="bn1d", state_norm="none", output_norm=True,
        atom_encoder="atom_ae", atom_encoder_in=ge.atom_width() + 3,
        bond_encoder="bond_ae", bond_encoder_in=ge.bond_width(),
        input_norm=True, edge_mlp_tail_repeats=50)


def att_model_mpnn_cfg(ge):
    """att_model (models/att_model.py semantics: per-step AttEdgeNetwork
    + adj aggregation + stateless masked BN + set2vec, GRU over the
    evolving state) — rides the T-step att kernel
    (kernels/fused_att.py::make_fused_att_steps_op)."""
    from mpnn_tpu import models
    nf = ge.atom_width() + 3
    return models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=4 * nf,
        message_fn="att_edge_network", aggregation="adj",
        share_message_weights=False, update_hidden="state",
        state_norm="stateless", readout="set2vec", set2vec_steps=12,
        message_steps=3, edge_mlp_tail_repeats=50)


def basic_mpnn_cfg(ge):
    """Basic family (basic_model.py semantics: shared EdgeNetwork, NO
    norms, 3 steps — also the single_target / autoencoder shape) — rides
    the norm-mode-generalized whole-step kernel."""
    from mpnn_tpu import models
    nf = ge.atom_width() + 3
    return models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=4 * ge.atom_width(),
        message_steps=3, edge_mlp_tail_repeats=50)


def graph_norm_mpnn_cfg(ge):
    """graph_norm family (normed_basic_model.py semantics: PER-STEP
    message fns + stateless masked BN) — rides the per-step kernel with
    the stateless norm mode."""
    from mpnn_tpu import models
    nf = ge.atom_width() + 3
    return models.MPNNConfig(
        node_features=nf, edge_features=ge.bond_width(),
        message_features=nf, output_dim=4 * ge.atom_width(),
        message_steps=3, share_message_weights=False,
        state_norm="stateless", edge_mlp_tail_repeats=50)


def bilinear_mpnn_cfg(ge):
    """ecfp_bilinear family (basic_model_ecfp.py semantics: parameterless
    bilinear message, ef == nf³ coherence, messages from the EVOLVING
    state, concat-state-history readout) — XLA sparse path (no kernel:
    per-edge bilinear chains have no A-form)."""
    from mpnn_tpu import models
    return models.MPNNConfig(
        node_features=2, edge_features=8, message_features=2,
        output_dim=32, message_fn="bilinear", aggregation="adj",
        message_steps=2, message_input="state", update_hidden="initial",
        concat_state_history=True)


def ggnn_mpnn_cfg(ge):
    """GGNN message family (ggnn_msg_pass.py semantics: per-bond-type
    weight matrices, type 0 pinned to zero) in the flagship lipo shell —
    natively A-form, so the whole-step fused kernel applies directly."""
    from mpnn_tpu import models
    nf = ge.atom_width() + 3
    return models.MPNNConfig(
        node_features=nf, edge_features=4, ggnn_num_edge_types=4,
        message_features=nf, output_dim=2 * ge.atom_width(),
        message_fn="ggnn", message_steps=6,
        msg_norm="bn1d", state_norm="bn1d")


def bench_sparse(batch_size: int, iters: int, dtype: str = "float32",
                 use_vocab: bool = True, spmm: str = "kernel",
                 spmm_block: int = 512, model: str = "flagship",
                 fuse: bool = False, tail: int | None = None,
                 tail_kernel: bool = False, steps_per_call: int = 50,
                 slots: bool = False, fuse_step: bool = False,
                 s2v_steps: int | None = None):
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.models.sparse import sparse_mpnn_apply
    from mpnn_tpu.train.optim import adam

    gs, ge = build_batch(batch_size, edge_types=(model == "ggnn"))
    cfg = {"flagship": flagship_mpnn_cfg, "att": att_mpnn_cfg,
           "ggnn": ggnn_mpnn_cfg, "encoded": encoded_mpnn_cfg,
           "att_model": att_model_mpnn_cfg, "basic": basic_mpnn_cfg,
           "graph_norm": graph_norm_mpnn_cfg,
           "encoded_ecfp": encoded_ecfp_mpnn_cfg,
           "bilinear": bilinear_mpnn_cfg}[model](ge)
    if tail is not None:        # component-isolation probe, not a real config
        import dataclasses
        cfg = dataclasses.replace(cfg, edge_mlp_tail_repeats=tail)
    if s2v_steps is not None and cfg.readout == "set2vec":
        import dataclasses
        cfg = dataclasses.replace(cfg, set2vec_steps=s2v_steps)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    if model == "ggnn":
        # integer bond-type ids aligned with edge_src/dst (padded edges ->
        # type 0 = the zero matrix); GGNN has no edge MLP, hence no vocab
        packed = G.with_edge_types(packed, gs)
        use_vocab = False
    if model == "bilinear":
        packed = shim_bilinear_widths(packed, cfg)
    if use_vocab:
        # edge vocab: run the ×50 edge-MLP per DISTINCT bond-feature row
        # (≤16 here), not per edge — exact (graphs/batching.py)
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
    spmm_vocab_fn = sddmm_fn = None
    if fuse_step:
        # whole-step fused kernel (kernels/fused_step.py): messages through
        # loss in ONE fwd pallas_call + a 3-kernel decomposed bwd; subsumes
        # --spmm/--fuse. Falls back to the decomposed kernel path when the
        # node count exceeds the forward's scoped-VMEM cap.
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        from mpnn_tpu.models.fused_train import fused_step_eligible
        assert model in ("flagship", "ggnn", "att", "encoded",
                         "att_model", "basic", "graph_norm",
                         "encoded_ecfp", "bilinear")
        assert use_vocab or model == "ggnn"
        packed = attach_fused_plan(packed, block_edges=spmm_block)
        assert "fs_win" in packed, "fused-step window plan failed"
        if fused_step_eligible(cfg, packed, training=True):
            spmm = "xla"                # no separate SpMM kernel needed
        else:
            fuse_step = False           # past FUSED_STEP_NODE_CAP
    if spmm == "kernel":
        from mpnn_tpu.kernels.spmm import attach_spmm_plan, make_spmm_op
        assert use_vocab or model == "ggnn", \
            "--spmm kernel needs the edge vocab (or GGNN's native A-form)"
        # att rides the TRANSPOSED sddmm (features in sublanes), which
        # needs 128-aligned lane windows
        packed = attach_spmm_plan(packed, block_edges=spmm_block,
                                  align=128 if model == "att" else 16)
        assert "spmm_win" in packed, "window plan failed"
        be = packed.pop("spmm_block_edges")
        win = packed.pop("spmm_window")
        if model == "att":
            from mpnn_tpu.kernels.sddmm import make_sddmm_op
            sddmm_fn = make_sddmm_op(block_edges=be, window=win,
                                     layout="t")
        else:
            spmm_vocab_fn = make_spmm_op(block_edges=be, window=win)
    if slots:
        # scatter-free segment tables (ops/segments.py): A0 correction +
        # readout ride gathers instead of TPU-serialized scatters
        from mpnn_tpu.ops.segments import attach_segment_slots
        packed = attach_segment_slots(packed)
    if model != "bilinear":       # the bilinear shim already handled it
        packed["node_feats"] = np.concatenate(
            [packed["node_feats"], packed["node_nafm"]], axis=-1)
    edge_mlp_fn = None
    if tail_kernel:
        from mpnn_tpu.kernels.edge_mlp import make_edge_mlp_op
        assert use_vocab, "--tail-kernel needs the edge vocab"
        edge_mlp_fn = make_edge_mlp_op(cfg.edge_mlp_tail_repeats,
                                       block=32, bwd_block=32)
    fused_op = None
    if fuse_step:
        from mpnn_tpu.models.fused_train import (fused_step_eligible,
                                                 make_fused_step_for_batch)
        jb_probe = {k: v for k, v in packed.items()}
        assert fused_step_eligible(cfg, jb_probe, training=True)
        fused_op = make_fused_step_for_batch(cfg, packed)
        fuse = False
    recurrence_fn = None
    if fuse:
        from mpnn_tpu.kernels.recurrence import make_recurrence_op_auto
        assert model in ("flagship", "ggnn"), \
            "--fuse covers the step-constant-message families"
        recurrence_fn = make_recurrence_op_auto(
            cfg.message_steps, cfg.node_features,
            int(packed["node_feats"].shape[0]))
    real_edges = int(packed["edge_mask"].sum())
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    labels0 = jnp.asarray(
        np.random.RandomState(0).randn(
            packed["graph_mask"].shape[0]).astype(np.float32))
    node_bits = None
    if model == "encoded_ecfp":
        # per-ATOM Morgan bits as node-space labels (the collate_packed
        # node_labels layout, ~2% density) riding uint8 on device, plus
        # the reference's Linear(32, 16384) head
        # (test_graph_encode_norm_ecfp.py:95-100) trained alongside
        rs = np.random.RandomState(1)
        raw_bits = (rs.rand(packed["node_feats"].shape[0], ECFP_BITS)
                    < 0.02).astype(np.uint8) \
            * packed["node_mask"].astype(np.uint8)
        # ship the bits bit-PACKED (8×): the compile/dispatch tunnel
        # rejects request bodies past ~256 MB (HTTP 413 at batch 2048 —
        # 26k nodes × 16384 bytes); unpacked once per dispatch on device
        node_bits = jnp.asarray(np.packbits(raw_bits, axis=1))
        params = dict(params)
        params["ecfp_head"] = {
            "w": jnp.asarray(rs.randn(cfg.output_dim, ECFP_BITS)
                             .astype(np.float32)
                             * np.sqrt(2.0 / cfg.output_dim)),
            "b": jnp.zeros((ECFP_BITS,), jnp.float32)}
    cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if dtype == "bfloat16":
        # mixed precision: bf16 activations/compute, f32 master params
        jb = {k: (v.astype(cdtype) if hasattr(v, "dtype")
                  and v.dtype == jnp.float32 else v) for k, v in jb.items()}

    tx = adam(1e-3, weight_decay=1e-4)
    opt_state = tx.init(params)

    # amortize host→device dispatch latency: the tunnel costs ~4 ms per
    # dispatch even fully async (measured — a trivial jitted fn chained 10×
    # takes 40 ms wall), so 10 steps/call left 0.4 ms/step of pure tunnel
    # overhead inside every round-2 number; 50 cuts it to ~0.08
    STEPS_PER_CALL = steps_per_call

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def multi_step(params, state, opt_state, jb, labels0, it):
        # unpack the bit-packed labels ONCE per dispatch (amortized over
        # STEPS_PER_CALL scan steps; np.packbits is big-endian)
        nb_full = None
        if node_bits is not None:
            sh = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            nb_full = ((node_bits[:, :, None] >> sh) & 1).reshape(
                node_bits.shape[0], ECFP_BITS)

        def body(carry, k):
            params, state, opt_state = carry
            # per-step-unique labels: no two dispatches compute the same
            # function of the same inputs (anti-replay; see module doc)
            labels = labels0 + 1e-4 * (it * STEPS_PER_CALL + k)

            def loss_fn(p, s):
                cp = jax.tree.map(lambda x: x.astype(cdtype), p) \
                    if dtype == "bfloat16" else p
                cs = jax.tree.map(lambda x: x.astype(cdtype), s) \
                    if dtype == "bfloat16" else s
                if model == "encoded_ecfp":
                    # psteps kernel emits the 32-wide readout; output BN
                    # + the 16384-wide head + node-gathered sigmoid-MSE
                    # (train/trainer.py ecfp_mse semantics) ride in XLA
                    from mpnn_tpu.models.fused_train import fused_mpnn_out
                    if fused_op is not None:
                        out, ns = fused_mpnn_out(cp, cs, cfg, jb, fused_op)
                    else:
                        out, ns = sparse_mpnn_apply(cp, cs, cfg, jb,
                                                    training=True)
                    hd = cp["ecfp_head"]
                    pred = jax.nn.sigmoid(
                        out.astype(jnp.float32) @ hd["w"] + hd["b"])
                    # per-graph EXACT collapse (train/trainer.py ecfp_mse
                    # packed semantics): n_g·q² − 2·q·s1 + s1 with
                    # q = σ − shift; the anti-replay target shift
                    # (bits + c) folds into q since Σ(q−y)² needs only
                    # the binary-bit aggregate s1 = Σ_{v∈g} y_vb.
                    nm = jb["node_mask"]
                    ng = jb["node_graph"]
                    from mpnn_tpu.train.trainer import graph_label_sums
                    # node_window must be the STATIC plan int (packed is
                    # the host dict; jb's copy is traced inside this jit)
                    s1 = graph_label_sums(
                        nb_full, ng, jb, pred.shape[0], jnp.float32,
                        node_window=packed.get("fs_node_window"))
                    n_g = jax.ops.segment_sum(
                        nm[:, 0], ng, num_segments=pred.shape[0],
                        indices_are_sorted=True)
                    q = pred - 1e-4 * (it * STEPS_PER_CALL + k)
                    per = n_g[:, None] * (q * q) - 2.0 * q * s1 + s1
                    return per.sum() / (nm.sum() * ECFP_BITS), ns
                if fused_op is not None:
                    if cfg.message_fn in ("att_edge_network", "bilinear"):
                        # kernel computes the messages+GRU chain in one
                        # pallas_call; the readout (set2vec / concat-
                        # history gated output) + masked MSE in XLA
                        from mpnn_tpu.models.fused_train import \
                            fused_mpnn_out
                        out, ns = fused_mpnn_out(cp, cs, cfg, jb,
                                                 fused_op)
                        gm = jb["graph_mask"][:, None]
                        per = ((out.astype(jnp.float32)
                                - labels[:, None]) ** 2) * gm
                        return per.sum() / gm.sum(), ns
                    from mpnn_tpu.models.fused_train import \
                        fused_flagship_loss
                    loss, _, ns = fused_flagship_loss(
                        cp, cs, cfg, jb, labels, fused_op,
                        edge_mlp_fn=edge_mlp_fn)
                    return loss.astype(jnp.float32), ns
                out, ns = sparse_mpnn_apply(cp, cs, cfg, jb, training=True,
                                            spmm_vocab_fn=spmm_vocab_fn,
                                            sddmm_fn=sddmm_fn,
                                            recurrence_fn=recurrence_fn,
                                            edge_mlp_fn=edge_mlp_fn)
                gm = jb["graph_mask"][:, None]
                per = ((out.astype(jnp.float32) - labels[:, None]) ** 2) * gm
                return per.sum() / gm.sum(), ns

            (l, ns), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state)
            g = jax.tree.map(lambda x: x.astype(jnp.float32), g)
            ns = jax.tree.map(lambda x: x.astype(jnp.float32), ns)
            updates, opt_state2 = tx.update(g, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return (params2, ns, opt_state2), l

        (params, state, opt_state), ls = jax.lax.scan(
            body, (params, state, opt_state), jnp.arange(STEPS_PER_CALL))
        return params, state, opt_state, ls[-1]

    # warmup/compile
    params, state, opt_state, l = multi_step(params, state, opt_state, jb,
                                             labels0, jnp.int32(0))
    jax.device_get(l)
    t0 = time.perf_counter()
    for i in range(iters):
        params, state, opt_state, l = multi_step(
            params, state, opt_state, jb, labels0, jnp.int32(i + 1))
    lv = float(jax.device_get(l))        # host copy ⇒ compute finished
    dt = time.perf_counter() - t0
    assert np.isfinite(lv), f"non-finite loss {lv}"
    n_steps = iters * STEPS_PER_CALL
    print(f"[bench] {dt / n_steps * 1e3:.3f} ms/step over {n_steps} steps "
          f"(loss {lv:.4f})", file=sys.stderr)
    edge_msgs = real_edges * cfg.message_steps * n_steps
    return edge_msgs / dt, real_edges, lv


def bench_eval(batch_size: int, iters: int, model: str = "flagship",
               steps_per_call: int = 500, fuse: bool = True,
               s2v_steps: int | None = None):
    """Inference/serving throughput: forward-only, eval mode (running-stat
    BN — the mode a deployed predictor runs), packed sparse path."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mpnn_tpu import graphs as G
    from mpnn_tpu.models import mpnn_init
    from mpnn_tpu.models.sparse import sparse_mpnn_apply

    gs, ge = build_batch(batch_size, edge_types=(model == "ggnn"))
    cfg = {"flagship": flagship_mpnn_cfg, "att": att_mpnn_cfg,
           "ggnn": ggnn_mpnn_cfg, "encoded": encoded_mpnn_cfg,
           "att_model": att_model_mpnn_cfg, "basic": basic_mpnn_cfg,
           "graph_norm": graph_norm_mpnn_cfg,
           "encoded_ecfp": encoded_ecfp_mpnn_cfg,
           "bilinear": bilinear_mpnn_cfg}[model](ge)
    if s2v_steps is not None and cfg.readout == "set2vec":
        import dataclasses
        cfg = dataclasses.replace(cfg, set2vec_steps=s2v_steps)
    params, state = mpnn_init(jax.random.PRNGKey(317), cfg)
    packed = G.collate_packed(gs).as_dict()
    if model == "ggnn":
        packed = G.with_edge_types(packed, gs)
    elif model == "bilinear":
        packed = shim_bilinear_widths(packed, cfg)
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
    else:
        packed = G.attach_edge_vocab(packed, vocab_cap=16)
    eval_op = None
    if fuse and model in ("flagship", "ggnn", "att", "encoded",
                      "att_model", "basic", "graph_norm", "encoded_ecfp",
                      "bilinear"):
        # whole-step INFERENCE kernel (running-stat BN folded to affines):
        # messages -> recurrence -> readout in ONE launch
        from mpnn_tpu.kernels.fused_step import attach_fused_plan
        from mpnn_tpu.models.fused_train import (fused_eval_eligible,
                                                 make_fused_eval_for_batch)
        packed = attach_fused_plan(packed)
        if "fs_win" in packed and fused_eval_eligible(cfg, packed):
            eval_op = make_fused_eval_for_batch(cfg, packed)
    if model != "bilinear":       # bilinear already shimmed above
        packed["node_feats"] = np.concatenate(
            [packed["node_feats"], packed["node_nafm"]], axis=-1)
    real_edges = int(packed["edge_mask"].sum())
    jb = {k: jnp.asarray(v) if not np.isscalar(v) else v
          for k, v in packed.items()}
    if model == "encoded_ecfp":
        # serving = core + output BN + the 16384-wide head + sigmoid
        rs = np.random.RandomState(1)
        params = dict(params)
        params["ecfp_head"] = {
            "w": jnp.asarray(rs.randn(cfg.output_dim, ECFP_BITS)
                             .astype(np.float32)
                             * np.sqrt(2.0 / cfg.output_dim)),
            "b": jnp.zeros((ECFP_BITS,), jnp.float32)}

    @functools.partial(jax.jit, donate_argnums=())
    def multi_fwd(params, state, jb, it):
        def body(acc, k):
            b = dict(jb)
            # anti-replay: perturb the inputs per step (module docstring)
            b["node_feats"] = jb["node_feats"] \
                + 1e-6 * (it * steps_per_call + k)
            if eval_op is not None:
                from mpnn_tpu.models.fused_train import fused_mpnn_eval
                out = fused_mpnn_eval(params, state, cfg, b, eval_op)
            else:
                out, _ = sparse_mpnn_apply(params, state, cfg, b,
                                           training=False)
            if model == "encoded_ecfp":
                hd = params["ecfp_head"]
                out = jax.nn.sigmoid(
                    out.astype(jnp.float32) @ hd["w"] + hd["b"])
            return acc + out.sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(steps_per_call))
        return acc

    acc = multi_fwd(params, state, jb, jnp.int32(0))
    jax.device_get(acc)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = multi_fwd(params, state, jb, jnp.int32(i + 1))
    av = float(jax.device_get(acc))
    dt = time.perf_counter() - t0
    assert np.isfinite(av), f"non-finite output {av}"
    n_steps = iters * steps_per_call
    print(f"[bench] eval {dt / n_steps * 1e3:.3f} ms/step over {n_steps} "
          f"steps", file=sys.stderr)
    return real_edges * cfg.message_steps * n_steps / dt, real_edges, av


def bench_dense(batch_size: int, iters: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models
    from mpnn_tpu.train.optim import adam
    import optax

    gs, ge = build_batch(batch_size)
    cfg = flagship_mpnn_cfg(ge)
    params, state = models.mpnn_init(jax.random.PRNGKey(317), cfg)
    batch = G.collate_dense(gs, num_nodes=32)
    afm = np.concatenate([batch["afm"], batch["nafm"]], axis=-1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    jb["afm"] = jnp.asarray(afm)
    real_edges = int(batch["adj"].sum())
    labels0 = jnp.asarray(np.random.RandomState(0).randn(
        len(gs)).astype(np.float32))

    tx = adam(1e-3, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, jb, labels0, it):
        labels = labels0 + 1e-4 * it

        def loss_fn(p):
            out, ns = models.mpnn_apply(p, state, cfg, jb["afm"], jb["bfm"],
                                        jb["adj"], jb["mask"], training=True)
            return ((out - labels[:, None]) ** 2).mean(), ns
        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(g, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return l, params2, ns, opt_state2

    l, params, state, opt_state = step(params, state, opt_state, jb,
                                       labels0, jnp.int32(0))
    jax.device_get(l)
    t0 = time.perf_counter()
    for i in range(iters):
        l, params, state, opt_state = step(params, state, opt_state, jb,
                                           labels0, jnp.int32(i + 1))
    lv = float(jax.device_get(l))
    dt = time.perf_counter() - t0
    assert np.isfinite(lv), f"non-finite loss {lv}"
    edge_msgs = real_edges * cfg.message_steps * iters
    return edge_msgs / dt, real_edges, lv


def main(argv=None):
    # persistent compile cache: TPU compiles go through a slow remote tunnel
    # (~3-10 min cold for the default config); repeat runs become instant
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/mpnn_tpu_jaxcache")
    except Exception:
        pass
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="sparse",
                   choices=["sparse", "dense", "eval"],
                   help="sparse: packed TRAIN step (the headline metric); "
                        "dense: dense-path train step; eval: forward-only "
                        "inference (running-stat BN — the serving path)")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--no-vocab", action="store_true",
                   help="disable the edge-feature vocab dedup")
    p.add_argument("--spmm", default=None, choices=["xla", "kernel"],
                   help="message-step SpMM: the Pallas windowed one-hot "
                        "kernel (kernels/spmm.py — measured 2-3x over the "
                        "XLA gather+segment_sum path; flagship default) "
                        "or xla (att default: the fused SDDMM kernel "
                        "measured SLOWER end-to-end at bench shapes)")
    p.add_argument("--spmm-block", type=int, default=512,
                   help="edge-block/window size for the Pallas kernel")
    p.add_argument("--fuse-step", dest="fuse_step", action="store_true",
                   default=None,
                   help="whole-step fused kernel (kernels/fused_step.py): "
                        "messages through loss in ONE forward pallas_call + "
                        "a 3-kernel decomposed backward (DEFAULT for the "
                        "flagship — measured 0.434 ms/step vs 0.560)")
    p.add_argument("--no-fuse-step", dest="fuse_step", action="store_false")
    p.add_argument("--fuse", dest="fuse", action="store_true",
                   default=None,
                   help="fuse the BN-GRU-BN recurrence into one Pallas "
                        "kernel (kernels/recurrence.py; DEFAULT for the "
                        "flagship — measured 1.77 ms/step vs 2.15)")
    p.add_argument("--no-fuse", dest="fuse", action="store_false")
    p.add_argument("--tail", type=int, default=None,
                   help="override edge_mlp_tail_repeats (component-isolation "
                        "probe; the real config is 50)")
    p.add_argument("--tail-kernel", dest="tail_kernel", action="store_true",
                   default=False,
                   help="run the vocab edge-MLP chain as ONE Pallas kernel "
                        "per direction (kernels/edge_mlp.py) instead of the "
                        "tail_repeats-iteration lax.scan")
    p.add_argument("--slots", dest="slots", action="store_true",
                   default=False,
                   help="scatter-free segment tables (ops/segments.py; "
                        "measured SLOWER at bench shapes: 0.652 vs 0.591 "
                        "ms/step — kept opt-in for re-evaluation)")
    p.add_argument("--steps-per-call", type=int, default=500,
                   help="training steps batched per device dispatch "
                        "(lax.scan; amortizes the ~4 ms tunnel dispatch — "
                        "50 left ~80 us/step of pure dispatch overhead, "
                        "500 cuts it to ~8: 0.481 -> 0.436 ms/step measured)")
    p.add_argument("--model", default="flagship",
                   choices=["flagship", "att", "ggnn", "encoded",
                            "att_model", "basic", "graph_norm",
                            "encoded_ecfp", "bilinear"],
                   help="flagship (lipo EdgeNetwork), att (AttEdgeNetwork "
                        "+ att agg + set2vec, collapsed hidden), ggnn "
                        "(per-bond-type matrices), encoded (frozen AEs + "
                        "per-step weights/BN pairs — the psteps kernel), "
                        "or att_model (per-step AttEdge + stateless BN + "
                        "evolving state — the T-step att kernel)")
    p.add_argument("--s2v-steps", type=int, default=None,
                   help="override set2vec time_steps for the att families "
                        "(the reference default is 100, set2vec.py:79; the "
                        "family configs default to 12 for the legacy rows "
                        "— pass 100 for reference-shape rows)")
    args = p.parse_args(argv)

    # att now fuses too (kernels/fused_att.py) — fuse_step is the default
    # for every model; --fuse (the recurrence-only kernel) still covers
    # only the step-constant-message families
    recurrence_fusable = args.model in ("flagship", "ggnn")
    if args.mode == "sparse":
        value, real_edges, last_loss = bench_sparse(
            args.batch, args.iters, args.dtype,
            use_vocab=not args.no_vocab,
            spmm=("xla" if args.model in ("att", "att_model",
                                          "encoded", "graph_norm",
                                          "bilinear") else "kernel")
            if args.spmm is None else args.spmm,
            spmm_block=args.spmm_block, model=args.model,
            fuse=recurrence_fusable if args.fuse is None
            else args.fuse, tail=args.tail, tail_kernel=args.tail_kernel,
            steps_per_call=args.steps_per_call, slots=args.slots,
            fuse_step=(args.model == "ggnn" or not args.no_vocab)
            if args.fuse_step is None else args.fuse_step,
            s2v_steps=args.s2v_steps)
    elif args.mode == "eval":
        if args.dtype != "float32" or args.no_vocab:
            p.error("--mode eval supports neither --dtype nor --no-vocab")
        value, real_edges, last_loss = bench_eval(
            args.batch, args.iters, model=args.model,
            steps_per_call=args.steps_per_call,
            fuse=True if args.fuse_step is None else args.fuse_step,
            s2v_steps=args.s2v_steps)
    else:
        value, real_edges, last_loss = bench_dense(args.batch, args.iters)
    suffix = "" if args.model == "flagship" else f"_{args.model}"
    kind = ("eval_fwd" if args.mode == "eval"
            else f"train_step_{args.mode}")
    print(json.dumps({
        "metric": f"edge_messages_per_s_{kind}{suffix}",
        "value": round(value, 1),
        "unit": "edge-messages/s",
        "vs_baseline": round(value / BASELINE_EDGE_MSGS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
