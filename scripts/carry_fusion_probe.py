"""Probe: fuse small loop-carried buffers in the CelebA K-step scan.

The round-3 trace (BASELINE.md roofline section) shows ~313 us/step of
copies, dominated by 113x f32[512]-class loop-carry prefetch waits: the
K-step `lax.scan` carries ~170 pytree leaves (params + BN state + adam
m/v) and XLA double-buffers each small vector leaf as a separate copy op
with ~1 us of fixed overhead each.

Hypothesis: packing every small f32 leaf of (params, state, opt_state)
into ONE flat carry buffer (unpack at body entry, repack at body exit)
removes ~100 tiny copy/fusion ops per step for ~100 KB of extra
concat/slice traffic (negligible at 819 GB/s). This is the cheap version
of the `optax.flatten` experiment that LOST in round 3 — that one also
raveled the 25 MB conv kernels, and the ravel/unravel of the big leaves
cost more than the small-op savings. Here big leaves stay untouched.

Protocol: same as scripts/xla_flag_sweep.py's child — production B=100
CelebA step (3 ELBO terms), K-step scan windows, hard float() fences,
bf16 compute (the shipped default). Both variants run in one process.

Usage: python scripts/carry_fusion_probe.py [--k 240] [--windows 4]
       [--thresh-bytes 65536] [--f32]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvae_tpu.models.celeba import CelebaMVAE, N_ATTRS
from mvae_tpu.core.engine import multi_term_elbo
from mvae_tpu.train.loop import decode_batch, gather_local, \
    make_multi_train_step, resolve_decode_dtype

TERM_MASKS = [[1., 1.], [1., 0.], [0., 1.]]
TERM_LAMBDAS = [[10.0, 1.0]] * 3


class Packer:
    """Splits a pytree into (flat small-f32 vector, list of big leaves).

    Small = float32 leaves whose payload is <= thresh_bytes; everything
    else (big kernels, non-f32 leaves like adam's int32 count) passes
    through untouched. Pure index bookkeeping — jit-transparent.
    """

    def __init__(self, tree, thresh_bytes):
        leaves, self.treedef = jax.tree_util.tree_flatten(tree)
        self.n = len(leaves)
        self.small = [i for i, l in enumerate(leaves)
                      if l.dtype == jnp.float32
                      and l.size * 4 <= thresh_bytes]
        self.shapes = [leaves[i].shape for i in self.small]
        sizes = [leaves[i].size for i in self.small]
        self.offs = np.cumsum([0] + sizes).tolist()
        self.total = self.offs[-1]
        self.small_set = set(self.small)

    def split(self, tree):
        leaves = jax.tree_util.tree_flatten(tree)[0]
        if not self.small:
            return jnp.zeros((0,), jnp.float32), leaves
        flat = jnp.concatenate([leaves[i].ravel() for i in self.small])
        big = [l for i, l in enumerate(leaves) if i not in self.small_set]
        return flat, big

    def join(self, flat, big):
        leaves, bi = [], 0
        for i in range(self.n):
            if i in self.small_set:
                j = self.small.index(i)
                leaves.append(flat[self.offs[j]:self.offs[j + 1]]
                              .reshape(self.shapes[j]))
            else:
                leaves.append(big[bi])
                bi += 1
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


def make_packed_step(model, tx, packers):
    masks = jnp.asarray(TERM_MASKS, jnp.float32)
    lambdas = jnp.asarray(TERM_LAMBDAS, jnp.float32)
    pk_p, pk_s, pk_o = packers
    off_p, off_s = pk_p.total, pk_s.total

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def multi_step(flat, bigs, rng, data, idxs, betas):
        def body(carry, xs):
            flat, (pb, sb, ob), r = carry
            p = pk_p.join(flat[:off_p], pb)
            s = pk_s.join(flat[off_p:off_p + off_s], sb)
            o = pk_o.join(flat[off_p + off_s:], ob)
            idx, beta = xs
            r, sub = jax.random.split(r)
            # match the production step's decode dtype (bf16 under bf16
            # compute, MVAE_DECODE_BF16 honored) — the probe must bench
            # the same step configuration make_multi_train_step builds
            batch = decode_batch(gather_local(data, idx),
                                 resolve_decode_dtype(model))

            def loss_fn(pp):
                total, aux, new_state = multi_term_elbo(
                    model, pp, s, batch, masks, lambdas, sub, beta,
                    train=True)
                return total, new_state

            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, new_o = tx.update(grads, o, p)
            new_p = optax.apply_updates(p, updates)
            fp, pb = pk_p.split(new_p)
            fs, sb = pk_s.split(new_state)
            fo, ob = pk_o.split(new_o)
            return ((jnp.concatenate([fp, fs, fo]), (pb, sb, ob), r), loss)

        (flat, bigs, rng), losses = jax.lax.scan(
            body, (flat, bigs, rng), (idxs, betas))
        return flat, bigs, rng, losses

    return multi_step


def bench(fn, args_maker, k, windows, label):
    args = args_maker()
    for w in range(2):
        args, losses = fn(args, w)
    float(np.asarray(losses)[-1])
    times = []
    for w in range(windows):
        t0 = time.perf_counter()
        args, losses = fn(args, 10 + w)
        float(np.asarray(losses)[-1])
        times.append((time.perf_counter() - t0) / k)
    ms = np.asarray(times) * 1e3
    print(f"{label:14s}: {ms.mean():.3f} +- {ms.std():.3f} ms/step "
          f"({1e3 / ms.mean():.1f} steps/sec)  last_loss="
          f"{float(np.asarray(losses)[-1]):.2f}", flush=True)
    return ms.mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=240)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--thresh-bytes", type=int, default=65536)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ns = ap.parse_args()
    k = ns.k

    dtype = jnp.bfloat16 if ns.bf16 else jnp.float32
    model = CelebaMVAE(100, compute_dtype=dtype)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    host = np.random.default_rng(0)
    n = 2000
    data = {
        "image": jax.device_put((host.random((1, n, 64, 64, 3)) * 255
                                 ).astype(np.uint8)),
        "attrs": jax.device_put((host.random((1, n, N_ATTRS)) < 0.3
                                 ).astype(np.float32)),
    }
    betas = jnp.full((k,), 0.5, jnp.float32)

    def idxs_for(seed):
        return jnp.asarray(
            np.random.default_rng(seed).integers(0, n, (k, 1, 100)),
            jnp.int32)

    # ---- baseline: the shipped make_multi_train_step ----
    multi = make_multi_train_step(model, tx, TERM_MASKS, TERM_LAMBDAS)

    def run_base(args, seed):
        out = multi(*args, data, idxs_for(seed), betas)
        return out[:4], out[4]

    def base_args():
        p, s = model.init(jax.random.key(0))
        return (p, s, tx.init(p), jax.random.key(2))

    base_ms = bench(run_base, base_args, k, ns.windows, "baseline")

    # ---- packed-carry variant ----
    packers = (Packer(params, ns.thresh_bytes),
               Packer(state, ns.thresh_bytes),
               Packer(opt_state, ns.thresh_bytes))
    n_leaves = sum(pk.n for pk in packers)
    n_small = sum(len(pk.small) for pk in packers)
    kb = sum(pk.total for pk in packers) * 4 / 1024
    print(f"packing {n_small}/{n_leaves} leaves ({kb:.0f} KB) into one "
          f"carry buffer (thresh {ns.thresh_bytes} B)", flush=True)
    multi_packed = make_packed_step(model, tx, packers)

    def packed_args():
        p, s = model.init(jax.random.key(0))
        o = tx.init(p)
        fp, pb = packers[0].split(p)
        fs, sb = packers[1].split(s)
        fo, ob = packers[2].split(o)
        return (jnp.concatenate([fp, fs, fo]), (pb, sb, ob),
                jax.random.key(2))

    def run_packed(args, seed):
        flat, bigs, rng = args
        flat, bigs, rng, losses = multi_packed(
            flat, bigs, rng, data, idxs_for(seed), betas)
        return (flat, bigs, rng), losses

    packed_ms = bench(run_packed, packed_args, k, ns.windows, "packed-carry")
    print(f"delta: {(base_ms - packed_ms) / base_ms * 100:+.1f}%  "
          f"(positive = packed wins)", flush=True)


if __name__ == "__main__":
    main()
