"""Gold-standard quality parity: transplant a FAITHFUL torch restatement of
the full reference lipo driver (wrapper + MPNN + BatchNorm1d + halving head,
test_lipo.py:123-129) into our network, then train BOTH in lockstep on the
same batches — forward must match to float tolerance and the first training
steps' losses must track (trajectories drift later only through float
chaos amplified by BN+Adam; see CLAUDE.md numerical traps)."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, ".")


@pytest.fixture(scope="module")
def setup():
    import torch
    import dataclasses
    import jax
    from scripts.parity_train import (build_dataset, build_full_torch,
                                      transplant_torch_to_jax)
    from mpnn_tpu.models import build as build_net, network_init

    tr, va, ge = build_dataset(40, seed=11)
    tail, steps = 4, 3
    torch.manual_seed(317)
    tm = build_full_torch(ge.atom_width(), 3, ge.bond_width(),
                          2 * ge.atom_width(), tail, steps)
    cfg = build_net("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                    nafm=3, n_out=1)
    cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
        cfg.mpnn, edge_mlp_tail_repeats=tail, message_steps=steps))
    params, state = network_init(jax.random.PRNGKey(0), cfg)
    params = transplant_torch_to_jax(tm, params)
    return tr, ge, tm, cfg, params, state


def _torch_batch(graphs, ncap):
    import torch
    from mpnn_tpu import graphs as G
    b = G.collate_dense(graphs, num_nodes=ncap)
    return (torch.from_numpy(b["afm"]), torch.from_numpy(b["nafm"]),
            torch.from_numpy(b["bfm"]), torch.from_numpy(b["adj"]),
            torch.from_numpy(b["mask"]))


def test_transplanted_forward_identical(setup):
    import torch
    import jax.numpy as jnp
    from mpnn_tpu import graphs as G
    from mpnn_tpu.models.network import network_apply_packed

    tr, ge, tm, cfg, params, state = setup
    bt = tr[:16]
    ncap = int(-(-max(g.num_atoms for g in bt) // 8) * 8)
    with torch.no_grad():
        t_out = tm(*_torch_batch(bt, ncap)).numpy()
    pb = G.collate_packed(bt).as_dict()
    jb = {k: jnp.asarray(v) for k, v in pb.items() if k != "num_graphs"}
    j_out, _ = network_apply_packed(params, state, cfg, jb, training=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=5e-5)


def test_lockstep_training_losses_track(setup):
    import torch
    import jax
    import jax.numpy as jnp
    import optax
    from mpnn_tpu import graphs as G
    from mpnn_tpu.models.network import network_apply_packed
    from mpnn_tpu.train.optim import adam

    tr, ge, tm, cfg, params, state = setup
    ncap = int(-(-max(g.num_atoms for g in tr) // 8) * 8)
    topt = torch.optim.Adam(tm.parameters(), lr=1e-2, weight_decay=1e-4)
    tx = adam(1e-2, weight_decay=1e-4)
    ost = tx.init(params)

    @jax.jit
    def step(p, s, o, jb, y):
        def lf(p, s):
            out, ns = network_apply_packed(p, s, cfg, jb, training=True)
            return ((out - y[:, None]) ** 2).mean(), ns
        (l, ns), g = jax.value_and_grad(lf, has_aux=True)(p, s)
        u, o_ = tx.update(g, o, p)
        return l, optax.apply_updates(p, u), ns, o_

    tls, jls = [], []
    for it in range(4):
        bt = tr[(it * 16) % 32:(it * 16) % 32 + 16]
        y = np.asarray([g.label for g in bt], np.float32)
        topt.zero_grad()
        tl = ((tm(*_torch_batch(bt, ncap))
               - torch.from_numpy(y)[:, None]) ** 2).mean()
        tl.backward()
        topt.step()
        pb = G.collate_packed(bt).as_dict()
        jb = {k: jnp.asarray(v) for k, v in pb.items()
              if k != "num_graphs"}
        jl, params, state, ost = step(params, state, ost, jb,
                                      jnp.asarray(y))
        tls.append(float(tl.detach()))
        jls.append(float(jl))
    np.testing.assert_allclose(jls, tls, rtol=0.02)
