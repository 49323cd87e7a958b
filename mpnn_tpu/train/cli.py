"""CLI: `python -m mpnn_tpu.train.cli <verb>`.

Verbs (the reference's shell invocation `python test_X.py <stem>` becomes
`train --experiment X --data stem.csv`; featurize/resume/eval are new
first-class verbs — SURVEY.md §5 checkpoint/resume):

  featurize  CSV → encoded graph cache (.npz)
  train      train an experiment (optionally --resume)
  eval       evaluate a checkpoint on a dataset
  bench      single-chip throughput microbench (see also bench.py)
  list       list experiments and model-zoo entries
"""

from __future__ import annotations

import argparse
import json
import os


import numpy as np


def _load_for(exp, data_path, cache=None):
    from mpnn_tpu import graphs as G
    if cache and os.path.exists(cache):
        gs, ge, _meta = G.load_cache(cache)
        if getattr(exp, "edge_types", False) \
                and not all(hasattr(g, "edge_types") for g in gs):
            raise SystemExit(
                f"cache {cache!r} was featurized without the GGNN "
                f"bond-type ids experiment {exp.name!r} needs — "
                f"re-run `featurize --experiment {exp.name}`")
        return gs, ge
    et = getattr(exp, "edge_types", False)
    if exp.task == "classification":
        gs, _n, _labels, ge = G.load_classification_dataset(
            data_path, exp.mol_col, exp.label_col, edge_types=et)
    elif exp.task == "regression":
        gs, ge = G.load_number_dataset(data_path, exp.mol_col,
                                       exp.label_col, edge_types=et)
    elif exp.task == "affinity":
        gs, _n, _labels, ge = G.load_affinity_dataset(
            data_path, exp.mol_col, exp.label_col, exp.affinity_col,
            edge_types=et)
    elif exp.task == "ecfp":
        gs, ge = G.load_ecfp_dataset(data_path, exp.mol_col, exp.label_col)
    else:
        raise ValueError(exp.task)
    if cache:
        G.save_cache(cache, gs, ge)
    return gs, ge


def _build_net(exp, gs, n_out):
    from mpnn_tpu.models import build
    # take widths from the (possibly transformed/embedded) graphs themselves
    afm = int(gs[0].afm.shape[-1])
    bfm = int(gs[0].bfm.shape[-1])
    nafm = int(gs[0].nafm.shape[-1])
    return build(exp.model, afm=afm, bfm=bfm, nafm=nafm, n_out=n_out)


def _n_out_for(exp, gs):
    if exp.task == "classification":
        return int(max(g.label for g in gs)) + 1
    if exp.task == "ecfp":
        return int(np.asarray(gs[0].label).shape[-1])
    return 1


def cmd_featurize(args):
    from mpnn_tpu.train import experiments
    exp = experiments.get(args.experiment)
    gs, ge = _load_for(exp, args.data, cache=None)
    from mpnn_tpu import graphs as G
    G.save_cache(args.out, gs, ge)
    print(json.dumps({"graphs": len(gs), "atom_width": ge.atom_width(),
                      "bond_width": ge.bond_width(), "cache": args.out}))


def _apply_experiment_transforms(exp, gs):
    """Filters / one-vs-rest / embedding-feature steps declared on the
    experiment (the reference drivers' inline preprocessing)."""
    from mpnn_tpu.graphs.filters import (binarize_target,
                                         filter_by_label_count)
    if exp.filter_lower_count is not None or exp.filter_keep_first \
            is not None or exp.filter_upper_count is not None:
        gs, _, _ = filter_by_label_count(
            gs, lower_cutoff=exp.filter_lower_count,
            upper_cutoff=exp.filter_upper_count,
            keep_first=exp.filter_keep_first)
    if exp.binarize_target_class is not None:
        gs = binarize_target(gs, exp.binarize_target_class)
    if exp.affinity_target_class is not None:
        from mpnn_tpu.graphs.filters import affinity_labels
        gs = affinity_labels(gs, exp.affinity_target_class)
    if exp.embed_features:
        from mpnn_tpu.train import pretrain
        ap, _, av, _ = pretrain.pretrain_embedding_encoder(gs, "atom")
        bp, _, bv, _ = pretrain.pretrain_embedding_encoder(gs, "bond")
        gs = pretrain.embed_graphs(gs, ap, av, bp, bv)
    return gs


def cmd_train(args):
    import dataclasses
    from sklearn.model_selection import train_test_split
    from mpnn_tpu.graphs import GraphLoader
    from mpnn_tpu.train import experiments, trainer
    exp = experiments.get(args.experiment)
    gs, ge = _load_for(exp, args.data, cache=args.cache)
    n_loaded = len(gs)
    gs = _apply_experiment_transforms(exp, gs)
    if not gs:
        raise SystemExit(
            f"no graphs left after the experiment's filters "
            f"(loaded {n_loaded}; filters: count>{exp.filter_lower_count}, "
            f"count<{exp.filter_upper_count}) — the dataset is too small "
            f"for this experiment's class-count cutoffs")
    n_out = _n_out_for(exp, gs)
    net_cfg = _build_net(exp, gs, n_out)
    tcfg = exp.train
    overrides = {}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.ckpt_dir:
        overrides["ckpt_dir"] = args.ckpt_dir
    if args.log:
        overrides["log_path"] = args.log
    if args.packed:
        overrides["packed"] = True
    if getattr(args, "spmm", None):
        overrides["spmm"] = args.spmm
    if getattr(args, "fuse_step", False):
        overrides["fuse_step"] = True
    if overrides:
        tcfg = dataclasses.replace(tcfg, **overrides)
    init_params = init_state = None
    if args.atom_ae or args.bond_ae:
        import jax
        from mpnn_tpu.models.network import network_init
        from mpnn_tpu.train.pretrain import load_pretrained_encoders
        init_params, init_state = network_init(
            jax.random.PRNGKey(tcfg.seed), net_cfg)
        init_params = load_pretrained_encoders(
            init_params, atom_ckpt=args.atom_ae, bond_ckpt=args.bond_ae)
    # reference split discipline: 0.1 test, then 0.1 val, random_state=seed
    # (test_lipo.py:143-146)
    train_gs, test_gs = train_test_split(gs, test_size=0.1,
                                         random_state=tcfg.seed)
    train_gs, val_gs = train_test_split(train_gs, test_size=0.1,
                                        random_state=tcfg.seed)
    params, state, opt_state, history = trainer.train(
        net_cfg, tcfg, train_gs, val_gs, resume=args.resume,
        params=init_params, state=init_state)
    test_loader = GraphLoader(test_gs, tcfg.batch_size,
                              collate="packed" if tcfg.packed else "dense",
                              with_nafm=net_cfg.input_wrapper == "graph_norm")
    test_metrics = trainer.evaluate(params, state, net_cfg, test_loader,
                                    exp.loss, tcfg.metric_average)
    print(json.dumps({"experiment": exp.name, "epochs": len(history),
                      "test": test_metrics}))


def cmd_eval(args):
    from mpnn_tpu.train import experiments, trainer
    from mpnn_tpu.train.checkpoint import load_checkpoint
    from mpnn_tpu.models.network import network_init
    from mpnn_tpu import graphs as G
    import jax
    exp = experiments.get(args.experiment)
    gs, ge = _load_for(exp, args.data, cache=args.cache)
    net_cfg = _build_net(exp, gs, _n_out_for(exp, gs))
    params, state = network_init(jax.random.PRNGKey(exp.train.seed), net_cfg)
    params, state, _, _ = load_checkpoint(args.ckpt, params=params,
                                          state=state)
    packed = args.packed or args.fuse_eval
    loader = G.GraphLoader(gs, exp.train.batch_size,
                           collate="packed" if packed else "dense",
                           with_nafm=net_cfg.input_wrapper == "graph_norm",
                           fused_step_plan=args.fuse_eval)
    print(json.dumps(trainer.evaluate(
        params, state, net_cfg, loader, exp.loss,
        exp.train.metric_average, fuse_eval=args.fuse_eval,
        interpret=args.interpret)))


def cmd_predict(args):
    """Inference: checkpoint + SMILES CSV → predictions (JSON lines).
    The serving-side verb the reference lacks entirely."""
    from mpnn_tpu.train import experiments, trainer
    from mpnn_tpu.train.checkpoint import load_checkpoint
    from mpnn_tpu.models.network import network_init
    from mpnn_tpu import graphs as G
    import jax
    import jax.numpy as jnp
    exp = experiments.get(args.experiment)
    gs, ge = _load_for(exp, args.data, cache=args.cache)
    gs = _apply_experiment_transforms(exp, gs)
    net_cfg = _build_net(exp, gs, _n_out_for(exp, gs))
    params, state = network_init(jax.random.PRNGKey(exp.train.seed), net_cfg)
    params, state, _, _ = load_checkpoint(args.ckpt, params=params,
                                          state=state)
    packed = args.packed or args.fuse_eval
    loader = G.GraphLoader(gs, args.batch_size or exp.train.batch_size,
                           collate="packed" if packed else "dense",
                           with_nafm=net_cfg.input_wrapper == "graph_norm",
                           fused_step_plan=args.fuse_eval)
    idx = 0
    for batch in loader:
        # serving path: the whole-step INFERENCE kernel when eligible
        step = trainer.eval_step_for_batch(
            net_cfg, exp.loss, batch, fuse_eval=args.fuse_eval,
            interpret=args.interpret)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, out = step(params, state, jb)
        out = np.asarray(out)
        for row in out:
            if exp.loss == "ce":
                rec = {"index": idx, "pred": int(row.argmax()),
                       "logits": row.tolist()}
            else:
                rec = {"index": idx, "pred": float(row.reshape(-1)[0])}
            print(json.dumps(rec))
            idx += 1


def cmd_pretrain(args):
    """Pretrain atom/bond autoencoders or embedding encoders and save the
    artifacts (the reference's offline `.state_dict`/vocab-pickle flow,
    pickle-free)."""
    import json as _json
    from mpnn_tpu.train import experiments, pretrain
    from mpnn_tpu.train.checkpoint import save_checkpoint
    exp = experiments.get(args.experiment)
    gs, ge = _load_for(exp, args.data, cache=args.cache)
    results = {}
    if args.kind in ("autoencoder", "both"):
        # compressed widths match the encoded model-zoo defaults so
        # `train --atom-ae/--bond-ae` can inject these directly
        for which, e_dim in (("atom", args.atom_dim), ("bond", args.bond_dim)):
            in_dim = (gs[0].afm if which == "atom"
                      else gs[0].edge_feats).shape[-1]
            params, state, loss = pretrain.pretrain_autoencoder(
                gs, which, mid_dim=max(in_dim // 2, e_dim), e_dim=e_dim,
                epochs=args.epochs)
            save_checkpoint(f"{args.out}_{which}_ae.npz", params=params,
                            state=state, meta={"kind": f"{which}_ae",
                                               "loss": loss})
            results[f"{which}_ae_loss"] = loss
    if args.kind in ("embedding", "both"):
        for which in ("atom", "bond"):
            params, state, vocab, acc = pretrain.pretrain_embedding_encoder(
                gs, which, epochs=args.epochs)
            save_checkpoint(f"{args.out}_{which}_embed.npz", params=params,
                            state=state,
                            meta={"kind": f"{which}_embed", "vocab": vocab,
                                  "accuracy": acc})
            results[f"{which}_embed_acc"] = acc
    print(_json.dumps(results))


def cmd_list(args):
    from mpnn_tpu.train import experiments
    from mpnn_tpu.models.zoo import ZOO
    for name, e in experiments.EXPERIMENTS.items():
        print(f"{name:28s} task={e.task:14s} model={e.model:14s} {e.notes}")
    print("zoo:", ", ".join(sorted(ZOO)))


def cmd_bench(args):
    import bench as bench_mod  # repo-root bench harness
    bench_mod.main()


def main(argv=None):
    # honor an explicit JAX_PLATFORMS=cpu request even when a sitecustomize
    # plugin re-exported another platform (config wins at lazy backend init)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    p = argparse.ArgumentParser(prog="mpnn_tpu")
    sub = p.add_subparsers(dest="verb", required=True)

    f = sub.add_parser("featurize")
    f.add_argument("--experiment", required=True)
    f.add_argument("--data", required=True)
    f.add_argument("--out", required=True)
    f.set_defaults(fn=cmd_featurize)

    t = sub.add_parser("train")
    t.add_argument("--experiment", required=True)
    t.add_argument("--data", required=True)
    t.add_argument("--cache")
    t.add_argument("--epochs", type=int)
    t.add_argument("--batch-size", type=int)
    t.add_argument("--ckpt-dir")
    t.add_argument("--log")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--packed", action="store_true",
                   help="train on the sparse packed-COO path")
    t.add_argument("--fuse-step", dest="fuse_step", action="store_true",
                   help="whole-step fused Pallas kernel for eligible "
                        "packed configs (messages through readout in one "
                        "fwd pallas_call; silent fallback when ineligible)")
    t.add_argument("--spmm", choices=["xla", "kernel", "kernel_interpret"],
                   help="packed message-step SpMM backend (kernel = the "
                        "Pallas windowed one-hot kernel, TPU)")
    t.add_argument("--atom-ae", help="pretrained atom AE checkpoint "
                                     "(see the pretrain verb)")
    t.add_argument("--bond-ae", help="pretrained bond AE checkpoint")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval")
    e.add_argument("--experiment", required=True)
    e.add_argument("--data", required=True)
    e.add_argument("--cache")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--packed", action="store_true",
                   help="evaluate on the sparse packed-COO path")
    e.add_argument("--fuse-eval", dest="fuse_eval", action="store_true",
                   help="whole-step INFERENCE kernel (one pallas_call — "
                        "the serving path; implies --packed, silent "
                        "fallback when the config/batch is ineligible)")
    e.add_argument("--interpret", action="store_true",
                   help="run Pallas kernels in interpret mode (CPU testing)")
    e.set_defaults(fn=cmd_eval)

    pd = sub.add_parser("predict")
    pd.add_argument("--experiment", required=True)
    pd.add_argument("--data", required=True)
    pd.add_argument("--cache")
    pd.add_argument("--ckpt", required=True)
    pd.add_argument("--batch-size", type=int)
    pd.add_argument("--packed", action="store_true",
                    help="predict on the sparse packed-COO path")
    pd.add_argument("--fuse-eval", dest="fuse_eval", action="store_true",
                    help="whole-step INFERENCE kernel (one pallas_call — "
                         "the serving path; implies --packed)")
    pd.add_argument("--interpret", action="store_true",
                    help="run Pallas kernels in interpret mode (CPU testing)")
    pd.set_defaults(fn=cmd_predict)

    pr = sub.add_parser("pretrain")
    pr.add_argument("--experiment", required=True)
    pr.add_argument("--data", required=True)
    pr.add_argument("--cache")
    pr.add_argument("--out", required=True)
    pr.add_argument("--kind", default="both",
                    choices=["autoencoder", "embedding", "both"])
    pr.add_argument("--epochs", type=int, default=200)
    pr.add_argument("--atom-dim", type=int, default=8)
    pr.add_argument("--bond-dim", type=int, default=2)
    pr.set_defaults(fn=cmd_pretrain)

    l = sub.add_parser("list")
    l.set_defaults(fn=cmd_list)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
