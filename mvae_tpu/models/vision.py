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

    def decode(self, params, state, z, rng, train,
               stop_grads=frozenset()):
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

    def recon_loss(self, name, logits, target):
        lo = logits.reshape(logits.shape[0], -1)
        ta = target.reshape(target.shape[0], -1)
        return bce_row_sum(lo, ta)
