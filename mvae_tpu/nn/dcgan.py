"""Configurable conv/deconv stacks — the shared shape of every image
encoder/decoder in the reference (SURVEY.md §2.2):

  encoder: [conv -> (BN) -> swish]* -> flatten -> fc(512) -> swish
           -> (dropout) -> fc(2L)
  decoder: fc -> swish (-> fc -> swish) -> reshape -> [convT -> BN -> swish]*
           -> convT (logits, no activation)

The reference re-declares these stacks five times with different channel
tables (fashionmnist/model.py:70-121, multimnist/model.py:75-142,
celeba/model.py:66-133, celeba19/model.py:92-159, vision/model.py:109-180);
here one builder is parameterized by a spec list.

Layout: NHWC activations, HWIO kernels (TPU-native).
"""

import jax
import jax.numpy as jnp

from mvae_tpu.nn.conv import conv2d, conv_transpose2d
from mvae_tpu.nn.initializers import (
    conv_init, conv_transpose_init, linear_init)
from mvae_tpu.nn.layers import linear, swish, dropout
from mvae_tpu.nn.norm import batchnorm_init, batchnorm_swish_apply

# spec row: (c_out, kernel, stride, pad, use_bn)


def conv_stack_init(key, c_in, specs):
    params, state = [], []
    keys = jax.random.split(key, len(specs))
    for k, (c_out, kern, _s, _p, bn) in zip(keys, specs):
        p = {"conv": conv_init(k, c_in, c_out, kern)}
        st = {}
        if bn:
            p["bn"], st = batchnorm_init(c_out)
        params.append(p)
        state.append(st)
        c_in = c_out
    return params, state


def _cast(p, dtype):
    """Cast a conv/linear param dict's weights to the compute dtype (params
    are stored f32; casting at use keeps optimizer state in f32 — standard
    mixed-precision). BN params stay f32."""
    if dtype is None:
        return p
    return {k: (v.astype(dtype) if k in ("w", "b") else v)
            for k, v in p.items()}


def conv_stack_apply(params, state, specs, x, *, train, dtype=None):
    """swish after every block (BN before swish where configured).

    dtype: optional compute dtype (bfloat16 feeds the MXU at full rate);
    BN statistics always accumulate in f32.
    """
    new_state = []
    if dtype is not None:
        x = x.astype(dtype)
    fused_moments = train and _convbn_pallas()
    for p, st, (_c, kern, s, pad, bn) in zip(params, state, specs):
        cp = _cast(p["conv"], dtype)
        if bn and fused_moments and "b" not in cp:
            from mvae_tpu.ops.convbn_pallas import conv2d_moments, supported
            from mvae_tpu.nn.norm import batchnorm_swish_from_moments
            if supported(x.shape, kern, s, pad):
                y, ms, mq = conv2d_moments(x, cp["w"], s, pad)
                x, st = batchnorm_swish_from_moments(p["bn"], st, y, ms, mq)
                new_state.append(st)
                continue
        x = conv2d(cp, x, stride=s, padding=pad)
        if bn:
            x, st = batchnorm_swish_apply(p["bn"], st, x, train=train)
        else:
            x = swish(x)
        new_state.append(st)
    return x, new_state


def _convbn_pallas() -> bool:
    """MVAE_CONVBN_PALLAS=1 (trace-time read, single-device only): route
    BN'd convs through the fused conv+moments Pallas kernel
    (ops/convbn_pallas.py) so the BN moment reduction pass disappears."""
    from mvae_tpu.ops.convbn_pallas import use_convbn_pallas
    return use_convbn_pallas()


def deconv_stack_init(key, c_in, specs):
    # the apply pairs every BN with a swish; a BN'd FINAL (logits) layer
    # would get swished too, silently constraining the logits — no current
    # family does this (all DEC_SPECS end bn=False); reject it loudly
    if specs and specs[-1][4]:
        raise ValueError("deconv_stack: final (logits) layer must not use "
                         "BN — BN here is always fused with swish")
    params, state = [], []
    keys = jax.random.split(key, len(specs))
    for k, (c_out, kern, _s, _p, bn) in zip(keys, specs):
        p = {"conv": conv_transpose_init(k, c_in, c_out, kern)}
        st = {}
        if bn:
            p["bn"], st = batchnorm_init(c_out)
        params.append(p)
        state.append(st)
        c_in = c_out
    return params, state


def deconv_stack_apply(params, state, specs, x, *, train, dtype=None):
    """BN+swish between layers; the FINAL convT emits raw logits (f32)."""
    new_state = []
    last = len(specs) - 1
    if dtype is not None:
        x = x.astype(dtype)
    for i, (p, st, (_c, kern, s, pad, bn)) in enumerate(
            zip(params, state, specs)):
        x = conv_transpose2d(_cast(p["conv"], dtype), x, stride=s, padding=pad)
        if bn:                      # every BN'd deconv layer feeds a swish
            x, st = batchnorm_swish_apply(p["bn"], st, x, train=train)
        elif i != last:
            x = swish(x)
        new_state.append(st)
    if train and dtype is not None and _bf16_logits():
        return x, new_state          # bf16 logits; losses accumulate f32
    return x.astype(jnp.float32), new_state


def _bf16_logits() -> bool:
    """Keep TRAIN-mode decoder logits in the compute dtype instead of
    materializing them f32 — halves the write+read HBM bytes of the step's
    largest activation (the (T, B, 64, 64, C) recon logits). The loss side
    upcasts to f32 before any arithmetic (core/losses.py), so losses and
    gradients are BIT-IDENTICAL to the f32-logits form (tested); measured
    +4% on the celeba step (1.876 -> 1.803 ms, BASELINE.md BN section), so
    since round 3 this is the DEFAULT whenever a compute dtype is set;
    MVAE_BF16_LOGITS=0 restores the f32 materialization. Eval/sampling
    always emit f32."""
    import os
    return os.environ.get("MVAE_BF16_LOGITS", "1") != "0"


def head_init(key, d_in, n_latents, *, hidden=512):
    k1, k2 = jax.random.split(key)
    return {"fc": linear_init(k1, d_in, hidden),
            "out": linear_init(k2, hidden, 2 * n_latents)}


def head_apply(params, x, *, rng, train, dropout_rate=0.0, dtype=None):
    """Posterior head; output is always f32 (mu/logvar feed exp())."""
    if dtype is not None:
        x = x.astype(dtype)
    h = swish(linear(_cast(params["fc"], dtype), x))
    if dropout_rate and train and rng is not None:
        h = dropout(rng, h, dropout_rate, train)
    return linear(_cast(params["out"], dtype), h).astype(jnp.float32)
