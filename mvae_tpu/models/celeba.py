"""CelebA MVAE: 64x64 RGB image (DCGAN CNN) + 18 binary attributes (one
joint expert).

Architectures per /root/reference/celeba/model.py:
  ImageEncoder (:66-100): conv 3->32->64->128->256 (4,2,1 x3; 4,1,0) with BN
    from the 2nd conv on, swish; FC 256*5*5 -> 512 -> dropout(0.1) -> 2L.
  ImageDecoder (:103-133): FC L -> 256*5*5, swish; convT 256->128->64->32->3
    (4,1,0 then 4,2,1 x3), BN+swish between, logits out.
  AttributeEncoder (:136-160): 18 -> 512 -> 512 with BatchNorm1d + swish -> 2L.
  AttributeDecoder (:163-190): L -> 512 x3 (BN1d + swish) -> 18 logits.
Losses per /root/reference/celeba/train.py:22-65: pixel BCE summed over
3*64*64; attribute BCE summed over the 18 attributes (their per-attribute
loop == a sum over the attribute axis).
"""

import jax
import jax.numpy as jnp

from mvae_tpu.models.base import MultimodalVAE, stop_grads_apply
from mvae_tpu.nn.dcgan import (
    conv_stack_init, conv_stack_apply, deconv_stack_init, deconv_stack_apply,
    head_init, head_apply)
from mvae_tpu.nn.initializers import linear_init
from mvae_tpu.nn.layers import linear, swish
from mvae_tpu.nn.norm import batchnorm_init, batchnorm_swish_apply
from mvae_tpu.core.losses import bce_row_sum

ENC_SPECS = [(32, 4, 2, 1, False), (64, 4, 2, 1, True),
             (128, 4, 2, 1, True), (256, 4, 1, 0, True)]   # 64->32->16->8->5
DEC_SPECS = [(128, 4, 1, 0, True), (64, 4, 2, 1, True),
             (32, 4, 2, 1, True), (3, 4, 2, 1, False)]     # 5->8->16->32->64
N_ATTRS = 18


def _mlp_bn_init(key, dims, d_out):
    """linear->BN1d->swish blocks, then a plain linear head."""
    keys = jax.random.split(key, len(dims))
    params, state = [], []
    for i in range(len(dims) - 1):
        p = {"fc": linear_init(keys[i], dims[i], dims[i + 1])}
        p["bn"], st = batchnorm_init(dims[i + 1])
        params.append(p)
        state.append(st)
    head = linear_init(keys[-1], dims[-1], d_out)
    return {"blocks": params, "head": head}, state


def _mlp_bn_apply(params, state, x, *, train):
    new_state = []
    for p, st in zip(params["blocks"], state):
        x = linear(p["fc"], x)
        x, st = batchnorm_swish_apply(p["bn"], st, x, train=train)
        new_state.append(st)
    return linear(params["head"], x), new_state


class CelebaMVAE(MultimodalVAE):
    modalities = ("image", "attrs")

    def __init__(self, n_latents: int = 100, compute_dtype=None):
        self.n_latents = n_latents
        # bfloat16 runs the conv stacks at full MXU rate; params/optimizer,
        # BN statistics, posteriors, and losses stay f32 (mixed precision)
        self.compute_dtype = compute_dtype

    def input_spec(self):
        return {"image": ((64, 64, 3), jnp.float32),
                "attrs": ((N_ATTRS,), jnp.float32)}

    def init(self, key):
        L = self.n_latents
        k = jax.random.split(key, 6)
        conv_p, conv_st = conv_stack_init(k[0], 3, ENC_SPECS)
        deconv_p, deconv_st = deconv_stack_init(k[1], 256, DEC_SPECS)
        attr_enc_p, attr_enc_st = _mlp_bn_init(k[2], [N_ATTRS, 512, 512], 2 * L)
        attr_dec_p, attr_dec_st = _mlp_bn_init(k[3], [L, 512, 512, 512], N_ATTRS)
        params = {
            "image_enc": {"conv": conv_p,
                          "head": head_init(k[4], 256 * 5 * 5, L)},
            "image_dec": {"up": linear_init(k[5], L, 256 * 5 * 5),
                          "deconv": deconv_p},
            "attrs_enc": attr_enc_p,
            "attrs_dec": attr_dec_p,
        }
        state = {"enc": {"image": conv_st, "attrs": attr_enc_st},
                 "dec": {"image": deconv_st, "attrs": attr_dec_st}}
        return params, state

    def encode(self, params, state, inputs, rng, train):
        L = self.n_latents
        x = inputs["image"]
        h, img_st = conv_stack_apply(params["image_enc"]["conv"],
                                     state["enc"]["image"], ENC_SPECS, x,
                                     train=train, dtype=self.compute_dtype)
        h = h.reshape(h.shape[0], -1)
        img_p = head_apply(params["image_enc"]["head"], h, rng=rng,
                           train=train, dropout_rate=0.1,
                           dtype=self.compute_dtype)

        a_p, attr_st = _mlp_bn_apply(params["attrs_enc"],
                                     state["enc"]["attrs"],
                                     inputs["attrs"].astype(jnp.float32),
                                     train=train)
        mu = jnp.stack([img_p[:, :L], a_p[:, :L]])
        logvar = jnp.stack([img_p[:, L:], a_p[:, L:]])
        return mu, logvar, {"image": img_st, "attrs": attr_st}

    def decode(self, params, state, z, rng, train,
               stop_grads=frozenset()):
        h = swish(linear(params["image_dec"]["up"], z))
        h = h.reshape(-1, 5, 5, 256)
        img, img_st = deconv_stack_apply(params["image_dec"]["deconv"],
                                         state["dec"]["image"], DEC_SPECS, h,
                                         train=train,
                                         dtype=self.compute_dtype)
        attrs, attr_st = _mlp_bn_apply(params["attrs_dec"],
                                       state["dec"]["attrs"], z, train=train)
        return (stop_grads_apply({"image": img, "attrs": attrs},
                                 stop_grads),
                {"image": img_st, "attrs": attr_st})

    def recon_loss(self, name, logits, target):
        lo = logits.reshape(logits.shape[0], -1)
        ta = target.reshape(target.shape[0], -1).astype(jnp.float32)
        return bce_row_sum(lo, ta)
