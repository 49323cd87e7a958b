"""A/B the streaming recurrence kernels (blocked 2(T+1)-pass vs merged
T+2-pass) on the real TPU at flagship bench shapes.

Anti-replay discipline per BASELINE.md: per-iteration input perturbation
inside a lax.scan, device_get timing."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=13312)
    p.add_argument("--f", type=int, default=10)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--scan", type=int, default=50)
    p.add_argument("--blk", type=int, default=8192)
    p.add_argument("--which", default="both",
                   choices=["both", "blocked", "merged", "monolithic",
                            "all"])
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpnn_tpu_jaxcache")
    from mpnn_tpu.kernels.recurrence import (
        make_recurrence_op, make_recurrence_op_blocked,
        make_recurrence_op_merged)
    from mpnn_tpu.ops.norm import bn1d_init
    from mpnn_tpu.ops.update import gru_init

    rs = np.random.RandomState(0)
    msgs = jnp.asarray(rs.randn(args.n, args.f).astype(np.float32))
    h0 = jnp.asarray(rs.randn(args.n, args.f).astype(np.float32))
    mask = jnp.asarray((rs.rand(args.n, 1) > 0.06).astype(np.float32))
    gru = gru_init(jax.random.PRNGKey(0), args.f, args.f)
    ma_p, _ = bn1d_init(args.f)
    bn_p, _ = bn1d_init(args.f)
    gt = jnp.asarray(rs.randn(args.n, args.f).astype(np.float32))

    makers = {"blocked": make_recurrence_op_blocked,
              "merged": make_recurrence_op_merged,
              "monolithic": lambda s, f, n, blk: make_recurrence_op(s, f, n)}
    wanted = {"both": ["blocked", "merged"],
              "all": ["blocked", "merged", "monolithic"]}.get(
                  args.which, [args.which])
    for name in wanted:
        op = makers[name](args.steps, args.f, args.n, blk=args.blk)

        @jax.jit
        def many(msgs, h0, gru, ma_p, bn_p, it):
            def body(carry, k):
                m0, l_acc = carry
                m = m0 + 1e-5 * (it * args.scan + k)   # anti-replay

                def loss(mm, hh, gg, aa, bb):
                    out, _, _ = op(mm, hh, mask, gg, aa, bb)
                    return (out * gt).sum()
                l, gr_ = jax.value_and_grad(loss, argnums=(0,))(
                    m, h0, gru, ma_p, bn_p)
                return (m0, l_acc + l * 1e-9), None
            (m0, l), _ = jax.lax.scan(body, (msgs, jnp.float32(0)),
                                      jnp.arange(args.scan))
            return l

        l = many(msgs, h0, gru, ma_p, bn_p, jnp.int32(0))
        jax.device_get(l)
        t0 = time.perf_counter()
        for i in range(args.iters):
            l = many(msgs, h0, gru, ma_p, bn_p, jnp.int32(i + 1))
        lv = float(jax.device_get(l))
        dt = time.perf_counter() - t0
        n_calls = args.iters * args.scan
        assert np.isfinite(lv), lv
        print(f"{name}: {dt / n_calls * 1e6:.1f} us/fwd+bwd "
              f"({n_calls} calls, loss {lv:.4f})")


if __name__ == "__main__":
    main()
