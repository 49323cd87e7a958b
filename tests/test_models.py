"""Model composition tests: every zoo config builds, runs jitted forward,
is differentiable, and respects masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu import models
from test_ops import make_graph_batch

AFM, BFM, NAFM = 6, 4, 3
B, N = 3, 7


def small_batch(seed=0, ggnn=False, ef=BFM):
    afm, bfm, adj, mask = make_graph_batch(seed=seed, b=B, n=N, nf=AFM, ef=ef)
    rs = np.random.RandomState(seed + 100)
    nafm = (rs.randn(B, N, NAFM) * mask).astype(np.float32)
    batch = {
        "afm": jnp.asarray(afm), "bfm": jnp.asarray(bfm),
        "adj": jnp.asarray(adj), "mask": jnp.asarray(mask),
        "nafm": jnp.asarray(nafm),
    }
    if ggnn:
        types = (rs.randint(1, 5, size=adj.shape) * adj).astype(np.int32)
        batch["bfm"] = jnp.asarray(types)
    return batch


def _shrunk(cfg: models.NetworkConfig) -> models.NetworkConfig:
    """Cut the expensive compat constants for test speed."""
    import dataclasses
    m = dataclasses.replace(cfg.mpnn, edge_mlp_tail_repeats=3,
                            set2vec_steps=4)
    return dataclasses.replace(cfg, mpnn=m)


CASES = {
    "basic": dict(afm=AFM, bfm=BFM, n_out=4),
    "adv": dict(afm=AFM, bfm=BFM, n_out=4),
    "lipo": dict(afm=AFM, bfm=BFM, nafm=NAFM, n_out=1),
    "graph_norm": dict(afm=AFM, bfm=BFM, n_out=4),
    "autoencoder": dict(afm=AFM, bfm=BFM),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.slow
def test_zoo_forward_and_grad(name):
    cfg = _shrunk(models.build(name, **CASES[name]))
    params, state = models.network_init(jax.random.PRNGKey(0), cfg)
    batch = small_batch()

    @jax.jit
    def fwd(params, state, batch):
        return models.network_apply(params, state, cfg, batch, training=True)

    out, new_state = fwd(params, state, batch)
    assert out.ndim == 2 and out.shape[0] == B
    assert bool(jnp.isfinite(out).all())

    def loss(params):
        o, _ = models.network_apply(params, state, cfg, batch, training=True)
        return (o ** 2).mean()

    g = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


@pytest.mark.slow
def test_encoded_config():
    """Encoded model needs 30-dim raw afm / 8-dim raw bfm (AE input shapes)."""
    cfg = _shrunk(models.build("encoded", n_out=4))
    afm, bfm, adj, mask = make_graph_batch(seed=3, b=B, n=N, nf=30, ef=8)
    batch = {"afm": jnp.asarray(afm), "bfm": jnp.asarray(bfm),
             "adj": jnp.asarray(adj), "mask": jnp.asarray(mask)}
    params, state = models.network_init(jax.random.PRNGKey(1), cfg)
    out, _ = models.network_apply(params, state, cfg, batch, training=True)
    assert out.shape == (B, 4)
    assert bool(jnp.isfinite(out).all())


def test_ecfp_bilinear_config():
    nf = 2
    cfg = _shrunk(models.build("ecfp_bilinear", afm=nf, bfm=nf ** 3))
    afm, bfm, adj, mask = make_graph_batch(seed=4, b=B, n=N, nf=nf, ef=nf ** 3)
    batch = {"afm": jnp.asarray(afm), "bfm": jnp.asarray(bfm),
             "adj": jnp.asarray(adj), "mask": jnp.asarray(mask)}
    params, state = models.network_init(jax.random.PRNGKey(2), cfg)
    out, _ = models.network_apply(params, state, cfg, batch, training=True)
    # history concat: (steps+1)·nf = 3·nf input → readout out_dim
    assert out.shape[0] == B
    assert bool(jnp.isfinite(out).all())


def test_bn_state_advances_in_train_not_eval():
    cfg = _shrunk(models.build("lipo", **CASES["lipo"]))
    params, state = models.network_init(jax.random.PRNGKey(0), cfg)
    batch = small_batch()
    _, s_train = models.network_apply(params, state, cfg, batch, training=True)
    _, s_eval = models.network_apply(params, state, cfg, batch, training=False)
    rm0 = state["mpnn"]["bn"][0]["running_mean"]
    assert not np.allclose(np.asarray(s_train["mpnn"]["bn"][0]["running_mean"]),
                           np.asarray(rm0))
    np.testing.assert_array_equal(
        np.asarray(s_eval["mpnn"]["bn"][0]["running_mean"]), np.asarray(rm0))


def test_incoherent_configs_rejected():
    with pytest.raises(ValueError, match="contract hazard"):
        models.MPNNConfig(node_features=4, edge_features=4,
                          message_features=4, output_dim=8,
                          message_fn="edge_network", aggregation="adj")
    with pytest.raises(ValueError, match="per-pair"):
        models.MPNNConfig(node_features=4, edge_features=4,
                          message_features=4, output_dim=8,
                          message_fn="att_edge_network", aggregation="fused")
    with pytest.raises(ValueError, match="message_features"):
        models.MPNNConfig(node_features=4, edge_features=4,
                          message_features=8, output_dim=8)


def test_mask_invariance_of_forward():
    """Values in padded slots must not affect outputs (whole-network)."""
    cfg = _shrunk(models.build("lipo", **CASES["lipo"]))
    params, state = models.network_init(jax.random.PRNGKey(0), cfg)
    batch = small_batch()
    out1, _ = models.network_apply(params, state, cfg, batch, training=True)
    # poison the padded afm slots
    poisoned = dict(batch)
    pad = 1.0 - np.asarray(batch["mask"])
    poisoned["afm"] = batch["afm"] + 37.0 * pad
    poisoned["nafm"] = batch["nafm"] + 11.0 * pad
    out2, _ = models.network_apply(params, state, cfg, poisoned, training=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-4)


def test_remat_is_numerically_transparent():
    import dataclasses
    cfg = _shrunk(models.build("lipo", **CASES["lipo"]))
    m = dataclasses.replace(cfg.mpnn, remat=True)
    cfg_r = dataclasses.replace(cfg, mpnn=m)
    params, state = models.network_init(jax.random.PRNGKey(0), cfg)
    batch = small_batch()

    def loss(c):
        def f(p):
            o, _ = models.network_apply(p, state, c, batch, training=True)
            return (o ** 2).mean()
        return f

    l0 = float(loss(cfg)(params))
    l1 = float(loss(cfg_r)(params))
    assert l0 == pytest.approx(l1, rel=1e-6)
    g0 = jax.grad(loss(cfg))(params)
    g1 = jax.grad(loss(cfg_r))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
