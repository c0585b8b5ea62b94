"""CelebA-19 step breakdown on the real TPU.

The 21+-term celeba19 step is the framework's heaviest graph. This script
times each pipeline stage in isolation (encode / fuse+reparam / vmapped
decode / losses / full fwd / fwd+bwd / full optimizer step), each as a
K-iteration lax.scan per dispatch with a hard host fetch as the fence
(block_until_ready on donated pytrees is unreliable over this tunnel —
BASELINE.md), in f32 and bf16. The breakdown directs the optimization
work; results land in BASELINE.md.

Run: python scripts/profile_celeba19.py [--batch 100] [--k 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402
import numpy as np                                             # noqa: E402
import optax                                                   # noqa: E402

from mvae_tpu.core.engine import multi_term_elbo               # noqa: E402
from mvae_tpu.core.poe import masked_product_of_experts        # noqa: E402
from mvae_tpu.core.subsets import celeba19_step_terms          # noqa: E402
from mvae_tpu.models.celeba19 import Celeba19MVAE, N_ATTRS     # noqa: E402


def bench_scan(fn, k, *args):
    """Time k scan iterations of fn per dispatch; returns ms/iter.
    fn(carry, i) -> carry must consume its output into the carry so XLA
    cannot dead-code it."""
    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(lambda c, i: (fn(c, i), None), c0,
                            jnp.arange(k))
        return c
    c = run(jnp.float32(0.0))          # compile + warm
    float(c)
    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        c = run(jnp.float32(r))
        float(c)                       # hard fence
    return (time.perf_counter() - t0) / (reps * k) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--n-latents", type=int, default=100)
    ns = ap.parse_args()
    B, K, L = ns.batch, ns.k, ns.n_latents

    host = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(host.random((B, 64, 64, 3)), jnp.float32),
        "attrs": jnp.asarray((host.random((B, N_ATTRS)) < 0.3), jnp.float32),
    }
    mk, lk = celeba19_step_terms(np.random.default_rng(1), 1, N_ATTRS,
                                 1.0, 10.0)
    masks = jnp.asarray(mk, jnp.float32)
    lambdas = jnp.asarray(lk, jnp.float32)
    T = masks.shape[0]
    tx = optax.adam(1e-4)

    for tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        model = Celeba19MVAE(L, compute_dtype=dtype)
        params, state = model.init(jax.random.key(0))
        opt_state = tx.init(params)

        def enc(c, i):
            mu, lv, _ = model.encode(params, state, batch,
                                     jax.random.fold_in(jax.random.key(1), i),
                                     True)
            return c + jnp.sum(mu[0, 0]) + jnp.sum(lv[0, 0])

        mu0, lv0, _ = model.encode(params, state, batch, None, False)

        def fuse(c, i):
            f = jax.vmap(masked_product_of_experts, in_axes=(None, None, 0))
            pm, pl = f(mu0 + c * 0, lv0, masks)
            eps = jax.random.normal(jax.random.fold_in(jax.random.key(2), i),
                                    pm.shape)
            z = pm + eps * jnp.exp(0.5 * pl)
            return c + jnp.sum(z[0, 0])

        z0 = jnp.zeros((T, B, L))

        def dec(c, i):
            keys = jax.random.split(jax.random.fold_in(jax.random.key(3), i),
                                    T)
            recons, _ = jax.vmap(
                lambda zt, kt: model.decode(params, state, zt, kt, True)
            )(z0 + c * 0, keys)
            return c + jnp.sum(recons["image"][0, 0, 0]) \
                + jnp.sum(recons["attrs"][0, 0])

        from mvae_tpu.core.engine import _decode_grouped
        from mvae_tpu.core.subsets import celeba19_recon_support
        support = celeba19_recon_support(1, N_ATTRS)

        def dec_grouped(c, i):
            keys = jax.random.split(jax.random.fold_in(jax.random.key(3), i),
                                    T)
            recons, _ = _decode_grouped(model, params, state, z0 + c * 0,
                                        keys, True, support)
            return c + jnp.sum(recons["image"][0, 0, 0]) \
                + jnp.sum(recons["attrs"][0, 0])

        def fwd(c, i):
            total, _, _ = multi_term_elbo(
                model, params, state, batch, masks, lambdas,
                jax.random.fold_in(jax.random.key(4), i), 0.5 + c * 0,
                train=True)
            return c + total * 0 + total

        def fwdbwd(c, i):
            def loss_fn(p):
                total, _, st = multi_term_elbo(
                    model, p, state, batch, masks, lambdas,
                    jax.random.fold_in(jax.random.key(5), i), 0.5,
                    train=True)
                return total + c * 0, st
            (lo, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return c + lo + jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(g[..., :1]) * 0, grads, 0.0)

        rows = [("encode (19 experts once)", enc),
                ("fuse+reparam (T=%d)" % T, fuse),
                ("decode all T", dec),
                ("decode grouped+gather", dec_grouped),
                ("full forward", fwd),
                ("forward+backward", fwdbwd)]
        print(f"--- {tag} (batch {B}, T={T}, L={L}, K={K}/dispatch) ---",
              flush=True)
        for name, fn in rows:
            print(f"{name:28s} {bench_scan(fn, K):8.3f} ms", flush=True)

        # full optimizer step via the production multi-step path
        from mvae_tpu.train.loop import make_multi_train_step
        multi = make_multi_train_step(model, tx, None, None,
                                      dynamic_masks=True,
                                      recon_support=support)
        n = 1000
        data = {
            "image": jax.device_put((host.random((1, n, 64, 64, 3)) * 255
                                     ).astype(np.uint8)),
            "attrs": jax.device_put((host.random((1, n, N_ATTRS)) < 0.3
                                     ).astype(np.float32)),
        }
        idxs = jnp.asarray(host.integers(0, n, (K, 1, B)), jnp.int32)
        betas = jnp.full((K,), 0.5, jnp.float32)
        mks = jnp.broadcast_to(masks, (K,) + masks.shape)
        lks = jnp.broadcast_to(lambdas, (K,) + lambdas.shape)
        args = (params, state, opt_state, jax.random.key(6))
        out = multi(*args, data, idxs, betas, mks, lks)
        float(out[4][-1])
        t0 = time.perf_counter()
        for _ in range(2):
            out = multi(out[0], out[1], out[2], out[3], data, idxs, betas,
                        mks, lks)
            float(out[4][-1])
        dt = (time.perf_counter() - t0) / (2 * K) * 1e3
        print(f"{'FULL STEP (scan window)':28s} {dt:8.3f} ms "
              f"({1e3 / dt:.1f} steps/sec)", flush=True)


if __name__ == "__main__":
    main()
