"""Pallas TPU kernel: masked Product-of-Experts fusion for ALL ELBO terms
in one HBM pass.

The jnp path (core/poe.py + vmap over terms) reads the (M, B, D) posterior
stack once per term. This kernel computes every term's fused posterior in a
single pass: the (B, D) axes are flattened OUTSIDE the kernel (a free
metadata reshape; Mosaic's layout inference rejects in-kernel merges of
non-lane-aligned dims), a (M, TILE_C) column block of mu/logvar is loaded
into VMEM, precisions are formed once, and the (T, M) mask matrix contracts
them on the MXU — both (T, TILE_C) outputs written per block. HBM traffic
drops from O(T*M*B*D) reads to O(M*B*D).

Gradients: custom_vjp with a closed-form jnp backward.

Semantics identical to core.poe.masked_product_of_experts (single-eps
convention, folded-in N(0,I) prior); tested against it in
tests/test_pallas_kernels.py (interpreter mode on CPU, real mode on TPU).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _kernel(masks_ref, mu_ref, logvar_ref, pd_mu_ref, pd_logvar_ref):
    mu = mu_ref[:]                                   # (M, TC)
    logvar = logvar_ref[:]
    masks = masks_ref[:]                             # (T, M)
    prec = 1.0 / (jnp.exp(logvar) + EPS)
    prior_t = 1.0 / (1.0 + EPS)
    # HIGHEST: keep true f32 through the MXU (default rounds inputs to bf16,
    # which costs ~1e-2 absolute error on the fused posteriors)
    den = jnp.dot(masks, prec, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST) + prior_t  # (T, TC)
    num = jnp.dot(masks, mu * prec, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    pd_mu_ref[:] = num / den
    pd_logvar_ref[:] = -jnp.log(den)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _run(mu, logvar, masks):
    m, b, d = mu.shape
    t = masks.shape[0]
    c = b * d
    mu2 = mu.astype(jnp.float32).reshape(m, c)
    lv2 = logvar.astype(jnp.float32).reshape(m, c)
    masks = masks.astype(jnp.float32)
    tile_c = c if c <= 4096 else 2048
    pd_mu, pd_lv = pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(c, tile_c),),
        in_specs=[
            pl.BlockSpec((t, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_c), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_c), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, tile_c), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, tile_c), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t, c), jnp.float32)] * 2,
        interpret=_interpret(),
    )(masks, mu2, lv2)
    return pd_mu.reshape(t, b, d), pd_lv.reshape(t, b, d)


@jax.custom_vjp
def masked_poe_all_terms(mu, logvar, masks):
    """mu, logvar: (M, B, D); masks: (T, M) -> (pd_mu, pd_logvar) (T, B, D).

    Equals vmap(masked_product_of_experts, in_axes=(None, None, 0)).
    """
    return _run(mu, logvar, masks)


def _fwd(mu, logvar, masks):
    return _run(mu, logvar, masks), (mu, logvar, masks)


def _bwd(res, g):
    mu, logvar, masks = res
    g_mu, g_lv = g
    prec = 1.0 / (jnp.exp(logvar) + EPS)                   # (M, B, D)
    prior_t = 1.0 / (1.0 + EPS)
    den = jnp.einsum("tm,mbd->tbd", masks, prec) + prior_t
    num = jnp.einsum("tm,mbd->tbd", masks, mu * prec)
    d_num = g_mu / den
    d_den = -(g_mu * num) / (den * den) - g_lv / den
    d_mu = jnp.einsum("tm,tbd->mbd", masks, d_num) * prec
    d_prec = (jnp.einsum("tm,tbd->mbd", masks, d_num) * mu
              + jnp.einsum("tm,tbd->mbd", masks, d_den))
    d_lv = d_prec * (-(prec * prec) * jnp.exp(logvar))
    return d_mu, d_lv, jnp.zeros_like(masks)


masked_poe_all_terms.defvjp(_fwd, _bwd)
