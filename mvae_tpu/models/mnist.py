"""MNIST MVAE: 28x28 image (MLP) + digit label modalities.

Architectures per /root/reference/mnist/model.py:
  ImageEncoder (:67-84):  784 -> 512 -> 512 -> 2*L (two L-wide heads in the
      reference; a single 2L head is the same distribution — the convention
      fashionmnist/celeba already use — and one bigger MXU matmul).
  ImageDecoder (:87-105): L -> 512 -> 512 -> 512 -> 784 logits.
  TextEncoder  (:108-125): Embedding(10,512) -> swish -> 512 -> 2*L.
  TextDecoder  (:128-146): L -> 512 -> 512 -> 512 -> 10 logits.
Losses per /root/reference/mnist/train.py:20-94 (pixel BCE summed over 784;
10-class CE).
"""

import jax
import jax.numpy as jnp

from mvae_tpu.models.base import MultimodalVAE, stop_grads_apply
from mvae_tpu.nn.initializers import linear_init, embedding_init
from mvae_tpu.nn.layers import linear, swish, mlp_init, mlp_apply
from mvae_tpu.core.losses import (
    bce_row_sum,
    cross_entropy_with_logits,
)


class MnistMVAE(MultimodalVAE):
    modalities = ("image", "text")

    def __init__(self, n_latents: int = 64, compute_dtype=jnp.float32):
        self.n_latents = n_latents
        self.compute_dtype = compute_dtype

    def input_spec(self):
        return {"image": ((784,), jnp.float32), "text": ((), jnp.int32)}

    def init(self, key):
        L = self.n_latents
        k = jax.random.split(key, 4)
        params = {
            "image_enc": mlp_init(k[0], [784, 512, 512, 2 * L]),
            "image_dec": mlp_init(k[1], [L, 512, 512, 512, 784]),
            "text_enc": {
                "embed": embedding_init(jax.random.fold_in(k[2], 0), 10, 512),
                "fc": linear_init(jax.random.fold_in(k[2], 1), 512, 512),
                "head": linear_init(jax.random.fold_in(k[2], 2), 512, 2 * L),
            },
            "text_dec": mlp_init(k[3], [L, 512, 512, 512, 10]),
        }
        state = {"enc": {}, "dec": {}}
        return params, state

    def encode(self, params, state, inputs, rng, train):
        L = self.n_latents
        cd = self.compute_dtype
        img = inputs["image"].reshape(inputs["image"].shape[0], -1).astype(cd)
        h = mlp_apply(params["image_enc"][:-1], img, final_activation=True)
        img_p = linear(params["image_enc"][-1], h).astype(jnp.float32)

        # tiny vocab: one_hot @ table is an MXU matmul, not a gather
        onehot = jax.nn.one_hot(inputs["text"], 10, dtype=cd)
        h = swish(onehot @ params["text_enc"]["embed"]["table"].astype(cd))
        h = swish(linear(params["text_enc"]["fc"], h))
        txt_p = linear(params["text_enc"]["head"], h).astype(jnp.float32)

        mu = jnp.stack([img_p[:, :L], txt_p[:, :L]])
        logvar = jnp.stack([img_p[:, L:], txt_p[:, L:]])
        return mu, logvar, state["enc"]

    # both decoders are stateless MLPs: skipping one whose recon weight is
    # statically zero is EXACT (no BN statistics exist to diverge)
    exact_skip_groups = ("image", "text")

    def decode(self, params, state, z, rng, train,
               stop_grads=frozenset(), skip_decodes=frozenset()):
        z = z.astype(self.compute_dtype)
        B = z.shape[0]
        img = (jnp.zeros((B, 784), jnp.float32)
               if "image" in skip_decodes
               else mlp_apply(params["image_dec"], z).astype(jnp.float32))
        txt = (jnp.zeros((B, 10), jnp.float32)
               if "text" in skip_decodes
               else mlp_apply(params["text_dec"], z).astype(jnp.float32))
        return stop_grads_apply({"image": img, "text": txt},
                                stop_grads), state["dec"]

    def recon_loss(self, name, logits, target):
        if name == "image":
            t = target.reshape(target.shape[0], -1)
            return bce_row_sum(logits, t)
        return cross_entropy_with_logits(logits, target)
