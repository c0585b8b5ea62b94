"""FashionMNIST MVAE: 28x28 image (small CNN, no BN) + class label.

Architectures per /root/reference/fashionmnist/model.py:
  ImageEncoder (:70-94): conv 1->64->128 (4,2,1; no BN, no bias) + swish;
      FC 128*7*7 -> 512 -> swish -> 2L (no dropout).
  ImageDecoder (:97-121): FC L -> 512 -> 128*7*7 (swish after both);
      convT 128->64 (4,2,1) swish; convT 64->1 (4,2,1) logits.
  TextEncoder (:124-143): Embedding(10,512) -> swish -> 512 -> swish -> 2L.
  TextDecoder (:146-165): L -> 512 x3 -> 10 logits.
Losses identical in form to mnist (fashionmnist/train.py:20-94).
"""

import jax
import jax.numpy as jnp

from mvae_tpu.models.base import MultimodalVAE, stop_grads_apply
from mvae_tpu.nn.dcgan import (
    conv_stack_init, conv_stack_apply, deconv_stack_init, deconv_stack_apply)
from mvae_tpu.nn.initializers import linear_init, embedding_init
from mvae_tpu.nn.layers import linear, swish, mlp_init, mlp_apply
from mvae_tpu.core.losses import (
    bce_row_sum, cross_entropy_with_logits)

ENC_SPECS = [(64, 4, 2, 1, False), (128, 4, 2, 1, False)]   # 28->14->7
DEC_SPECS = [(64, 4, 2, 1, False), (1, 4, 2, 1, False)]     # 7->14->28


class FashionMnistMVAE(MultimodalVAE):
    modalities = ("image", "text")

    def __init__(self, n_latents: int = 64, compute_dtype=None):
        self.n_latents = n_latents
        # mixed precision covers the conv stacks; text MLPs stay f32
        self.compute_dtype = compute_dtype

    def input_spec(self):
        return {"image": ((28, 28, 1), jnp.float32), "text": ((), jnp.int32)}

    def init(self, key):
        L = self.n_latents
        k = jax.random.split(key, 7)
        conv_p, _ = conv_stack_init(k[0], 1, ENC_SPECS)
        deconv_p, _ = deconv_stack_init(k[1], 128, DEC_SPECS)
        params = {
            "image_enc": {"conv": conv_p,
                          "fc": linear_init(k[2], 128 * 7 * 7, 512),
                          "head": linear_init(k[3], 512, 2 * L)},
            "image_dec": {"up": mlp_init(k[4], [L, 512, 128 * 7 * 7]),
                          "deconv": deconv_p},
            "text_enc": {
                "embed": embedding_init(jax.random.fold_in(k[5], 0), 10, 512),
                "fc": linear_init(jax.random.fold_in(k[5], 1), 512, 512),
                "head": linear_init(jax.random.fold_in(k[5], 2), 512, 2 * L)},
            "text_dec": mlp_init(k[6], [L, 512, 512, 512, 10]),
        }
        return params, {"enc": {}, "dec": {}}

    def encode(self, params, state, inputs, rng, train):
        L = self.n_latents
        x = inputs["image"].reshape(-1, 28, 28, 1)
        h, _ = conv_stack_apply(params["image_enc"]["conv"], [{}] * 2,
                                ENC_SPECS, x, train=train,
                                dtype=self.compute_dtype)
        h = h.astype(jnp.float32)
        h = swish(linear(params["image_enc"]["fc"], h.reshape(h.shape[0], -1)))
        img_p = linear(params["image_enc"]["head"], h)

        onehot = jax.nn.one_hot(inputs["text"], 10)
        h = swish(onehot @ params["text_enc"]["embed"]["table"])
        h = swish(linear(params["text_enc"]["fc"], h))
        txt_p = linear(params["text_enc"]["head"], h)

        mu = jnp.stack([img_p[:, :L], txt_p[:, :L]])
        logvar = jnp.stack([img_p[:, L:], txt_p[:, L:]])
        return mu, logvar, state["enc"]

    # decoders carry no BN state: exact skips (see engine._decode_grouped)
    exact_skip_groups = ("image", "text")

    def decode(self, params, state, z, rng, train,
               stop_grads=frozenset(), skip_decodes=frozenset()):
        B = z.shape[0]
        if "image" in skip_decodes:
            img = jnp.zeros((B, 28, 28, 1), jnp.float32)
        else:
            h = mlp_apply(params["image_dec"]["up"], z,
                          final_activation=True)
            h = h.reshape(-1, 7, 7, 128)
            img, _ = deconv_stack_apply(params["image_dec"]["deconv"],
                                        [{}] * 2, DEC_SPECS, h, train=train,
                                        dtype=self.compute_dtype)
        txt = (jnp.zeros((B, 10), jnp.float32)
               if "text" in skip_decodes
               else mlp_apply(params["text_dec"], z))
        return stop_grads_apply({"image": img, "text": txt},
                                stop_grads), state["dec"]

    def recon_loss(self, name, logits, target):
        if name == "image":
            lo = logits.reshape(logits.shape[0], -1)
            ta = target.reshape(target.shape[0], -1)
            return bce_row_sum(lo, ta)
        return cross_entropy_with_logits(logits, target)
