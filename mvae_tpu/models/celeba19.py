"""CelebA-19 MVAE: 64x64 RGB image + 18 binary attributes, EACH attribute
its own expert (19 experts total).

Reference: /root/reference/celeba19/model.py. The reference holds 18
separate AttributeEncoder/AttributeDecoder modules in nn.ModuleLists
(:26-29) and loops them in Python (:58-60, :81-85). TPU-native redesign:
the 18 identical nets become STACKED parameter tensors with a leading
expert axis, evaluated as single einsums — one MXU matmul of shape
(B*18, 512) instead of 18 small ones. The expert axis is also the natural
expert-parallel sharding axis (leading dim over the "model" mesh axis).

Per-expert nets (celeba19/model.py:162-209):
  AttributeEncoder_i: Embedding(2, 512) -> swish -> 512 -> swish -> 2L
  AttributeDecoder_i: L -> 512 -> 512 -> 512 -> 1 logit (swish between)
Image nets identical to celeba (DCGAN, :92-159).
Loss (celeba19/train.py:26-60): image BCE summed over pixels with
lambda_image; per-attribute scalar BCE with lambda_attrs.
"""

import jax
import jax.numpy as jnp

from mvae_tpu.models.base import MultimodalVAE
from mvae_tpu.models.celeba import ENC_SPECS, DEC_SPECS
from mvae_tpu.nn.dcgan import (
    conv_stack_init, conv_stack_apply, deconv_stack_init, deconv_stack_apply,
    head_init, head_apply)
from mvae_tpu.nn.initializers import linear_init, embedding_init
from mvae_tpu.nn.layers import linear, swish
from mvae_tpu.core.losses import (
    binary_cross_entropy_with_logits, bce_row_sum)
from mvae_tpu.core.poe import masked_product_of_experts

N_ATTRS = 18


def _stacked_linear_init(key, n, d_in, d_out):
    ks = jax.random.split(key, n)
    ps = [linear_init(k, d_in, d_out) for k in ks]
    return {"w": jnp.stack([p["w"] for p in ps]),      # (n, d_in, d_out)
            "b": jnp.stack([p["b"] for p in ps])}      # (n, d_out)


class Celeba19MVAE(MultimodalVAE):
    # expert order: image first, then the 18 attributes
    modalities = ("image",) + tuple(f"attr_{i}" for i in range(N_ATTRS))

    def __init__(self, n_latents: int = 100, compute_dtype=None):
        self.n_latents = n_latents
        # optional bfloat16 for the conv stacks + stacked-expert einsums;
        # params/optimizer, BN stats, posteriors and losses stay f32
        self.compute_dtype = compute_dtype

    def input_spec(self):
        return {"image": ((64, 64, 3), jnp.float32),
                "attrs": ((N_ATTRS,), jnp.float32)}

    def init(self, key):
        L = self.n_latents
        k = jax.random.split(key, 9)
        conv_p, conv_st = conv_stack_init(k[0], 3, ENC_SPECS)
        deconv_p, deconv_st = deconv_stack_init(k[1], 256, DEC_SPECS)
        embeds = jnp.stack([
            embedding_init(kk, 2, 512)["table"]
            for kk in jax.random.split(k[2], N_ATTRS)])        # (18, 2, 512)
        params = {
            "image_enc": {"conv": conv_p,
                          "head": head_init(k[3], 256 * 5 * 5, L)},
            "image_dec": {"up": linear_init(k[4], L, 256 * 5 * 5),
                          "deconv": deconv_p},
            "attr_enc_experts": {
                "embed": embeds,
                "fc": _stacked_linear_init(k[5], N_ATTRS, 512, 512),
                "head": _stacked_linear_init(k[6], N_ATTRS, 512, 2 * L)},
            "attr_dec_experts": {
                "fc": [_stacked_linear_init(jax.random.fold_in(k[7], i),
                                            N_ATTRS,
                                            L if i == 0 else 512, 512)
                       for i in range(3)],
                "head": _stacked_linear_init(k[8], N_ATTRS, 512, 1)},
        }
        state = {"enc": {"image": conv_st}, "dec": {"image": deconv_st}}
        return params, state

    # -- encoders ----------------------------------------------------------

    def encode(self, params, state, inputs, rng, train):
        L = self.n_latents
        cd = self.compute_dtype
        h, conv_st = conv_stack_apply(params["image_enc"]["conv"],
                                      state["enc"]["image"], ENC_SPECS,
                                      inputs["image"], train=train, dtype=cd)
        img_p = head_apply(params["image_enc"]["head"],
                           h.reshape(h.shape[0], -1), rng=rng, train=train,
                           dropout_rate=0.1, dtype=cd)          # (B, 2L)

        pe = params["attr_enc_experts"]
        a = inputs["attrs"]                                      # (B, 18)
        # Embedding(2, .) lookup as lerp between the two rows (elementwise)
        e0, e1 = pe["embed"][:, 0, :], pe["embed"][:, 1, :]      # (18, 512)
        h = swish(e0[None] + a[..., None] * (e1 - e0)[None])     # (B, 18, 512)
        h = swish(jnp.einsum("bih,iho->bio", h, pe["fc"]["w"])
                  + pe["fc"]["b"][None])
        attr_p = (jnp.einsum("bih,iho->bio", h, pe["head"]["w"])
                  + pe["head"]["b"][None])                       # (B, 18, 2L)

        mu = jnp.concatenate([img_p[None, :, :L],
                              jnp.moveaxis(attr_p[..., :L], 1, 0)])
        logvar = jnp.concatenate([img_p[None, :, L:],
                                  jnp.moveaxis(attr_p[..., L:], 1, 0)])
        return mu, logvar, {"image": conv_st}                    # (19, B, L)

    # -- decoders ----------------------------------------------------------

    # decoder groups the engine may SKIP entirely in fast-term-decode mode
    # (zeros out the recon, leaves BN stats uncommitted for that term)
    skip_decode_groups = ("image",)
    # the stacked attr decoder is stateless (no BN): exact skip for the
    # image-only term
    exact_skip_groups = ("attrs",)

    def decode_group_key(self, support_row):
        """Terms whose static recon support covers a STRICT subset of the
        18 attr experts (the 18 single-attribute terms,
        celeba19/train.py:276-283) decode only those experts via a per-term
        params gather — exact, since the attr decoders are stateless and
        the other experts' recon weights are statically zero. Grouped by
        subset size so equal-shape terms share one vmapped einsum."""
        k = int(sum(1 for v in support_row[1:] if v))
        return k if 0 < k < N_ATTRS else None

    def decode_term_operands(self, support_rows):
        """(G, k) int32 expert indices for a group of same-size terms."""
        import numpy as np
        idx = np.stack([np.nonzero(np.asarray(r[1:]))[0]
                        for r in support_rows])
        return jnp.asarray(idx, jnp.int32)

    def decode(self, params, state, z, rng, train,
               stop_grads=frozenset(), skip_decodes=frozenset(),
               term_operand=None):
        cd = self.compute_dtype
        if "image" in skip_decodes:
            # fast-term-decode: this term's image-recon weight is
            # statically zero AND the caller opted out of reference-exact
            # BN statistics — skip the deconv stack entirely (the zeros
            # never reach the loss; the returned old state makes the EMA
            # composition a no-op for this term)
            img = jnp.zeros(z.shape[:1] + (64, 64, 3), jnp.float32)
            deconv_st = state["dec"]["image"]
        else:
            h = swish(linear(params["image_dec"]["up"], z))
            h = h.reshape(-1, 5, 5, 256)
            img, deconv_st = deconv_stack_apply(
                params["image_dec"]["deconv"], state["dec"]["image"],
                DEC_SPECS, h, train=train, dtype=cd)
            if "image" in stop_grads:
                # image-recon weight statically zero: decode is only needed
                # for BN statistics — kill its backward
                img = jax.lax.stop_gradient(img)
        if "attrs" in skip_decodes:
            attrs = jnp.zeros((z.shape[0], N_ATTRS), jnp.float32)
        else:
            pd = params["attr_dec_experts"]
            if term_operand is None:
                sel, n_exp = (lambda a: a), N_ATTRS
            else:
                # gather this term's (k,) experts out of the stacked params
                sel, n_exp = (lambda a: a[term_operand]), term_operand.shape[0]
            x = jnp.broadcast_to(z[:, None, :],
                                 (z.shape[0], n_exp, z.shape[1]))
            if cd is not None:
                x = x.astype(cd)
            for blk in pd["fc"]:
                w = sel(blk["w"])
                if cd is not None:
                    w = w.astype(cd)
                x = swish(jnp.einsum("bih,iho->bio", x, w)
                          + sel(blk["b"])[None])
            hw = sel(pd["head"]["w"])
            if cd is not None:
                hw = hw.astype(cd)
            out = (jnp.einsum("bih,iho->bio", x, hw)
                   + sel(pd["head"]["b"])[None])[..., 0]        # (B, n_exp)
            out = out.astype(jnp.float32)
            if term_operand is None:
                attrs = out
            else:
                # scatter the k logits back to expert columns; the zeros
                # carry statically-zero recon weight
                attrs = jnp.zeros((z.shape[0], N_ATTRS), jnp.float32)
                attrs = attrs.at[:, term_operand].set(out)
            if "attrs" in stop_grads:
                attrs = jax.lax.stop_gradient(attrs)
        return ({"image": img, "attrs": attrs}, {"image": deconv_st})

    def stop_grad_groups(self, support_row) -> frozenset:
        """Expert col 0 = the image decoder; cols 1..18 share the stacked
        attr-expert decoder — its gradient is needed if ANY attr column has
        recon support."""
        stop = set()
        if not support_row[0]:
            stop.add("image")
        if not any(support_row[1:]):
            stop.add("attrs")
        return frozenset(stop)

    # -- losses -------------------------------------------------------------

    def recon_losses(self, recons, inputs):
        """(B, 19): summed pixel BCE column + 18 per-attribute scalar BCEs
        (celeba19/train.py:50-57: image sums over pixels, each attribute is
        a single-logit BCE)."""
        img = bce_row_sum(
            recons["image"].reshape(recons["image"].shape[0], -1),
            inputs["image"].reshape(inputs["image"].shape[0], -1)
        )[:, None]                                               # (B, 1)
        att = binary_cross_entropy_with_logits(
            recons["attrs"], inputs["attrs"].astype(jnp.float32))  # (B, 18)
        return jnp.concatenate([img, att], axis=-1)

    # input-keyed losses for the IWAE evaluator (core/loglike.py)
    loglike_targets = ("image", "attrs")

    def recon_loss(self, name, logits, target):
        lo = logits.reshape(logits.shape[0], -1)
        ta = target.reshape(target.shape[0], -1).astype(jnp.float32)
        return bce_row_sum(lo, ta)

    # -- conditioning -------------------------------------------------------

    def infer(self, params, state, inputs, *, attrs_mask=None, rng=None,
              train: bool = False):
        """Fuse with image presence + a per-attribute 0/1 mask (the
        reference's per-attribute None list, celeba19/model.py:63-89)."""
        b = next(iter(inputs.values())).shape[0]
        full = dict(inputs)
        img_present = 1.0 if "image" in full else 0.0
        if "image" not in full:
            full["image"] = jnp.zeros((b, 64, 64, 3), jnp.float32)
        if "attrs" not in full:
            full["attrs"] = jnp.zeros((b, N_ATTRS), jnp.float32)
            if attrs_mask is None:
                attrs_mask = jnp.zeros((N_ATTRS,))
        if attrs_mask is None:
            attrs_mask = jnp.ones((N_ATTRS,))
        mask = jnp.concatenate([jnp.asarray([img_present]),
                                jnp.asarray(attrs_mask, jnp.float32)])
        mu, logvar, _ = self.encode(params, state, full, rng, train)
        return masked_product_of_experts(mu, logvar, mask)
