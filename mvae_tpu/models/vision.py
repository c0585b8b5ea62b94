"""Vision MVAE: six image modalities over CelebA — RGB, grayscale,
canny-edge, landmark-mask, half-obscured, watermarked.

Reference: /root/reference/vision/model.py:12-100 — six instances of ONE
parameterized DCGAN encoder/decoder pair (:109-180, same stacks as celeba)
with channel counts (3, 1, 1, 1, 3, 3); n_latents default 250.
Loss (vision/train.py:20-58): sum of present-modality pixel BCEs DIVIDED BY
N_MODALITIES=6 (all lambdas 1), + beta * KLD.

(The reference's vision experiment never actually ran — model.py has a
syntax error and train.py undefined names; SURVEY.md §2.6. This implements
the evident intent.)
"""

import os

import jax
import jax.numpy as jnp

from mvae_tpu.models.base import MultimodalVAE, stop_grads_apply
from mvae_tpu.nn.dcgan import (
    conv_stack_init, conv_stack_apply, deconv_stack_init, deconv_stack_apply,
    head_init, head_apply)
from mvae_tpu.nn.initializers import linear_init
from mvae_tpu.nn.layers import linear, swish
from mvae_tpu.core.losses import bce_row_sum

N_MODALITIES = 6
MODALITIES = ("image", "gray", "edge", "mask", "obscured", "watermark")
CHANNELS = {"image": 3, "gray": 1, "edge": 1, "mask": 1,
            "obscured": 3, "watermark": 3}

# The six per-modality nets are TWO architectures instantiated thrice each
# (channel count is the only difference — reference vision/model.py:16-28).
# MVAE_STACK_MODALITIES=1 stacks each group's params at APPLY time and runs
# one vmapped conv stack per group (6 conv-stack launches -> 2 per encode
# and per decode term; the convs lower to batch-grouped convolutions with
# 3x the batch). Checkpoint layout is unchanged — stacking is a jnp.stack
# of the live param pytrees inside the step. Per-modality BN moments are
# preserved exactly: vmap reduces each group slice independently.
GROUPS = (("image", "obscured", "watermark"), ("gray", "edge", "mask"))


def _stack_modalities() -> bool:
    return os.environ.get("MVAE_STACK_MODALITIES") == "1"


def _tree_stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _tree_index(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


def _enc_specs(_c_in):
    return [(32, 4, 2, 1, False), (64, 4, 2, 1, True),
            (128, 4, 2, 1, True), (256, 4, 1, 0, True)]


def _dec_specs(c_out):
    return [(128, 4, 1, 0, True), (64, 4, 2, 1, True),
            (32, 4, 2, 1, True), (c_out, 4, 2, 1, False)]


class VisionMVAE(MultimodalVAE):
    modalities = MODALITIES

    def __init__(self, n_latents: int = 250, compute_dtype=None):
        self.n_latents = n_latents
        self.compute_dtype = compute_dtype

    def input_spec(self):
        return {m: ((64, 64, CHANNELS[m]), jnp.float32) for m in MODALITIES}

    def init(self, key):
        L = self.n_latents
        params = {}
        enc_state, dec_state = {}, {}
        for i, m in enumerate(MODALITIES):
            k = jax.random.fold_in(key, i)
            ke, kh, kd, ku = jax.random.split(k, 4)
            conv_p, conv_st = conv_stack_init(ke, CHANNELS[m], _enc_specs(CHANNELS[m]))
            deconv_p, deconv_st = deconv_stack_init(kd, 256, _dec_specs(CHANNELS[m]))
            params[f"{m}_enc"] = {"conv": conv_p,
                                  "head": head_init(kh, 256 * 5 * 5, L)}
            params[f"{m}_dec"] = {"up": linear_init(ku, L, 256 * 5 * 5),
                                  "deconv": deconv_p}
            enc_state[m] = conv_st
            dec_state[m] = deconv_st
        return params, {"enc": enc_state, "dec": dec_state}

    def encode(self, params, state, inputs, rng, train):
        if _stack_modalities():
            return self._encode_stacked(params, state, inputs, rng, train)
        L = self.n_latents
        mus, lvs, new_st = [], [], {}
        for i, m in enumerate(MODALITIES):
            h, st = conv_stack_apply(params[f"{m}_enc"]["conv"],
                                     state["enc"][m], _enc_specs(CHANNELS[m]),
                                     inputs[m], train=train,
                                     dtype=self.compute_dtype)
            sub = None if rng is None else jax.random.fold_in(rng, i)
            p = head_apply(params[f"{m}_enc"]["head"],
                           h.reshape(h.shape[0], -1), rng=sub, train=train,
                           dropout_rate=0.1, dtype=self.compute_dtype)
            mus.append(p[:, :L])
            lvs.append(p[:, L:])
            new_st[m] = st
        return jnp.stack(mus), jnp.stack(lvs), new_st

    def _encode_stacked(self, params, state, inputs, rng, train):
        """One vmapped conv stack + head per channel group. Per-modality
        dropout keys replicate the unstacked path exactly
        (fold_in(rng, MODALITIES.index(m)))."""
        L = self.n_latents
        mu_d, lv_d, new_st = {}, {}, {}
        for grp in GROUPS:
            specs = _enc_specs(CHANNELS[grp[0]])
            p_g = _tree_stack([params[f"{m}_enc"] for m in grp])
            st_g = _tree_stack([state["enc"][m] for m in grp])
            x_g = jnp.stack([inputs[m] for m in grp])

            def f(p, st, x, key):
                h, st2 = conv_stack_apply(p["conv"], st, specs, x,
                                          train=train,
                                          dtype=self.compute_dtype)
                out = head_apply(p["head"], h.reshape(h.shape[0], -1),
                                 rng=key, train=train, dropout_rate=0.1,
                                 dtype=self.compute_dtype)
                return out, st2

            if rng is None:
                out, st2 = jax.vmap(
                    lambda p, st, x: f(p, st, x, None))(p_g, st_g, x_g)
            else:
                keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
                    jnp.asarray([MODALITIES.index(m) for m in grp]))
                out, st2 = jax.vmap(f)(p_g, st_g, x_g, keys)
            for j, m in enumerate(grp):
                mu_d[m] = out[j, :, :L]
                lv_d[m] = out[j, :, L:]
                new_st[m] = _tree_index(st2, j)
        mus = [mu_d[m] for m in MODALITIES]
        lvs = [lv_d[m] for m in MODALITIES]
        return jnp.stack(mus), jnp.stack(lvs), new_st

    def decode(self, params, state, z, rng, train,
               stop_grads=frozenset()):
        # Stacking would defeat the engine's dead-backward elimination for
        # stop-gradded decoders (stop_gradient on slices of one vmapped
        # conv output can't DCE the shared batched backward), so fall back
        # to the loop whenever stop-grads are requested. Vision's
        # production objective never requests any (all-ones recon masks —
        # experiments/vision/train.py RECON_MASKS), so the stacked path
        # covers every shipped configuration.
        if _stack_modalities() and not stop_grads:
            return self._decode_stacked(params, state, z, train, stop_grads)
        recons, new_st = {}, {}
        h0 = z
        for m in MODALITIES:
            h = swish(linear(params[f"{m}_dec"]["up"], h0))
            h = h.reshape(-1, 5, 5, 256)
            img, st = deconv_stack_apply(params[f"{m}_dec"]["deconv"],
                                         state["dec"][m],
                                         _dec_specs(CHANNELS[m]), h,
                                         train=train,
                                         dtype=self.compute_dtype)
            recons[m] = img
            new_st[m] = st
        return stop_grads_apply(recons, stop_grads), new_st

    def _decode_stacked(self, params, state, z, train, stop_grads):
        """One vmapped up-projection + deconv stack per channel group; z is
        closed over (shared across the group, unbatched in the vmap)."""
        recons, new_st = {}, {}
        for grp in GROUPS:
            specs = _dec_specs(CHANNELS[grp[0]])
            p_g = _tree_stack([params[f"{m}_dec"] for m in grp])
            st_g = _tree_stack([state["dec"][m] for m in grp])

            def f(p, st):
                h = swish(linear(p["up"], z))
                h = h.reshape(-1, 5, 5, 256)
                return deconv_stack_apply(p["deconv"], st, specs, h,
                                          train=train,
                                          dtype=self.compute_dtype)

            img, st2 = jax.vmap(f)(p_g, st_g)
            for j, m in enumerate(grp):
                recons[m] = img[j]
                new_st[m] = _tree_index(st2, j)
        return stop_grads_apply(recons, stop_grads), new_st

    def recon_loss(self, name, logits, target):
        lo = logits.reshape(logits.shape[0], -1)
        ta = target.reshape(target.shape[0], -1)
        return bce_row_sum(lo, ta)
