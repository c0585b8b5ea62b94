"""MultiMNIST MVAE: 50x50 image (CNN+BN) + digit string <=4 chars (GRU).

Architectures per /root/reference/multimnist/model.py:
  ImageEncoder (:75-111): conv 1->32->64->128->256 (4,2,1 x3; 4,2,0) with BN
      from the 2nd conv, swish; FC 256*2*2 -> 512 -> dropout(0.1) -> 2L.
  ImageDecoder (:114-142): FC L -> 256*2*2 swish; convT 256->128 (4,2,0),
      128->64 (4,2,1), 64->32 (5,2,1) [the odd 5-kernel at :132], 32->1
      (4,2,1); BN+swish between; logits out. 2->6->12->25->50.
  TextEncoder (:145-181): Embedding(12,200) -> 1-layer bidirectional GRU ->
      take last timestep, SUM the two directions -> FC 200 -> 2L.
  TextDecoder (:184-235): autoregressive GRU, 2 layers, hidden 200. h0 =
      z2h(z) repeated over both layers; each of 4 steps: embed(prev)+swish,
      concat z, GRU step, concat z, project to 12 logits; feedback is the
      argmax (no teacher forcing), starting from SOS. Here it is a lax.scan
      with carried (h1, h2, prev_token) — no Python recurrence.
Losses per /root/reference/multimnist/train.py:22-68: pixel BCE over 2500;
per-position CE summed over the 4 digit positions.
"""

import jax
import jax.numpy as jnp

from mvae_tpu.models.base import MultimodalVAE, stop_grads_apply
from mvae_tpu.data.text import MAX_LENGTH, N_CHARACTERS, SOS
from mvae_tpu.nn.dcgan import (
    conv_stack_init, conv_stack_apply, deconv_stack_init, deconv_stack_apply,
    head_init, head_apply)
from mvae_tpu.nn.initializers import linear_init, embedding_init, gru_init
from mvae_tpu.nn.layers import linear, swish, dropout
from mvae_tpu.nn.rnn import gru_cell, bigru_last_step
from mvae_tpu.core.losses import (
    bce_row_sum, cross_entropy_with_logits)

ENC_SPECS = [(32, 4, 2, 1, False), (64, 4, 2, 1, True),
             (128, 4, 2, 1, True), (256, 4, 2, 0, True)]   # 50->25->12->6->2
DEC_SPECS = [(128, 4, 2, 0, True), (64, 4, 2, 1, True),
             (32, 5, 2, 1, True), (1, 4, 2, 1, False)]     # 2->6->12->25->50
H = 200  # GRU hidden size


class MultiMnistMVAE(MultimodalVAE):
    modalities = ("image", "text")

    def __init__(self, n_latents: int = 64, compute_dtype=None):
        self.n_latents = n_latents
        # mixed precision covers the conv stacks (where the FLOPs are);
        # GRU/text nets and BN statistics stay f32
        self.compute_dtype = compute_dtype

    def input_spec(self):
        return {"image": ((50, 50, 1), jnp.float32),
                "text": ((MAX_LENGTH,), jnp.int32)}

    def init(self, key):
        L = self.n_latents
        k = jax.random.split(key, 10)
        conv_p, conv_st = conv_stack_init(k[0], 1, ENC_SPECS)
        deconv_p, deconv_st = deconv_stack_init(k[1], 256, DEC_SPECS)
        params = {
            "image_enc": {"conv": conv_p,
                          "head": head_init(k[2], 256 * 2 * 2, L)},
            "image_dec": {"up": linear_init(k[3], L, 256 * 2 * 2),
                          "deconv": deconv_p},
            "text_enc": {"embed": embedding_init(k[4], N_CHARACTERS, H),
                         "gru_f": gru_init(k[5], H, H),
                         "gru_b": gru_init(jax.random.fold_in(k[5], 1), H, H),
                         "h2p": linear_init(k[6], H, 2 * L)},
            "text_dec": {"embed": embedding_init(k[7], N_CHARACTERS, H),
                         "z2h": linear_init(k[8], L, H),
                         "gru1": gru_init(jax.random.fold_in(k[9], 0), H + L, H),
                         "gru2": gru_init(jax.random.fold_in(k[9], 1), H, H),
                         "h2o": linear_init(jax.random.fold_in(k[9], 2),
                                            H + L, N_CHARACTERS)},
        }
        state = {"enc": {"image": conv_st}, "dec": {"image": deconv_st}}
        return params, state

    def encode(self, params, state, inputs, rng, train):
        L = self.n_latents
        x = inputs["image"].reshape(-1, 50, 50, 1)
        h, conv_st = conv_stack_apply(params["image_enc"]["conv"],
                                      state["enc"]["image"], ENC_SPECS, x,
                                      train=train, dtype=self.compute_dtype)
        img_p = head_apply(params["image_enc"]["head"],
                           h.reshape(h.shape[0], -1),
                           rng=rng, train=train, dropout_rate=0.1,
                           dtype=self.compute_dtype)

        te = params["text_enc"]
        emb = jnp.take(te["embed"]["table"], inputs["text"], axis=0)  # (B,T,H)
        xs = jnp.swapaxes(emb, 0, 1)                                  # (T,B,H)
        h_f, h_b = bigru_last_step(te["gru_f"], te["gru_b"], xs)
        txt_p = linear(te["h2p"], h_f + h_b)   # sum the directions (:179)

        mu = jnp.stack([img_p[:, :L], txt_p[:, :L]])
        logvar = jnp.stack([img_p[:, L:], txt_p[:, L:]])
        return mu, logvar, {"image": conv_st}

    # the autoregressive GRU text decoder is stateless (no BN): skipping
    # it for image-only terms is EXACT and saves a serial 4-step scan
    exact_skip_groups = ("text",)

    def decode(self, params, state, z, rng, train,
               stop_grads=frozenset(), skip_decodes=frozenset()):
        h = swish(linear(params["image_dec"]["up"], z))
        h = h.reshape(-1, 2, 2, 256)
        img, deconv_st = deconv_stack_apply(params["image_dec"]["deconv"],
                                            state["dec"]["image"], DEC_SPECS,
                                            h, train=train,
                                            dtype=self.compute_dtype)
        txt = (jnp.zeros((z.shape[0], MAX_LENGTH, N_CHARACTERS), jnp.float32)
               if "text" in skip_decodes
               else self._decode_text(params["text_dec"], z, rng, train))
        return stop_grads_apply({"image": img, "text": txt},
                                stop_grads), {"image": deconv_st}

    def _decode_text(self, td, z, rng, train):
        """4-step argmax-feedback GRU decode as lax.scan."""
        B = z.shape[0]
        h0 = linear(td["z2h"], z)              # z2h then repeat over layers
        prev0 = jnp.full((B,), SOS, jnp.int32)

        def step(carry, t):
            h1, h2, prev = carry
            c_in = swish(jnp.take(td["embed"]["table"], prev, axis=0))
            c_in = jnp.concatenate([c_in, z], axis=-1)
            h1 = gru_cell(td["gru1"], c_in, h1)
            x12 = h1
            if train and rng is not None:
                # torch nn.GRU(dropout=0.1) drops between stacked layers
                x12 = dropout(jax.random.fold_in(rng, t), x12, 0.1, train)
            h2 = gru_cell(td["gru2"], x12, h2)
            out = linear(td["h2o"], jnp.concatenate([h2, z], axis=-1))
            nxt = jnp.argmax(jax.nn.log_softmax(out, axis=-1),
                             axis=-1).astype(jnp.int32)
            return (h1, h2, nxt), out

        _, outs = jax.lax.scan(step, (h0, h0, prev0),
                               jnp.arange(MAX_LENGTH))
        return jnp.swapaxes(outs, 0, 1)        # (B, T, n_chars) logits

    def recon_loss(self, name, logits, target):
        if name == "image":
            lo = logits.reshape(logits.shape[0], -1)
            ta = target.reshape(target.shape[0], -1)
            return bce_row_sum(lo, ta)
        # CE per digit position, summed over the 4 positions (:54-61)
        return jnp.sum(cross_entropy_with_logits(logits, target), axis=-1)
