"""Pallas TPU kernel: fused train-mode BatchNorm + swish, forward and VJP.

Replaces the jnp BN(+swish) subgraph (nn/norm.py:batchnorm_apply followed
by nn/layers.py:swish) inside the conv/deconv stacks with four Pallas
kernels that never materialize intermediates:

  fwd  K1  partial per-lane sum / sum-of-squares of x     (1 read)
       K2  y = swish((x - mean) * invstd * scale + bias)  (1 read, 1 write)
  bwd  K3  partial per-lane sum(dz), sum(dz * xhat)       (reads x, g)
       K4  dx = P*dz + Q + R*xhat, dz recomputed          (reads x, g; 1 write)

where z is the BN output, dz = g * swish'(z). XLA's autodiff of the jnp
form materializes dz (and xhat) between its reduction and dx fusions; K3/K4
recompute them in-register instead, trading cheap VPU flops for an HBM
round-trip of a full activation per BN layer per step.

Moment semantics match nn/norm.py's one-pass form (var = E[x^2] - E[x]^2,
clamped at 0); the EMA state update stays in jnp at the call site.

Layout: the (..., C) activation is viewed 2-D with full 128-lane rows:
  C >= 128 (C % 128 == 0): (numel/C, C)     — lane j is channel j
  C <  128 (128 % C == 0): (numel/128, 128) — lane j is channel j % C,
     per-lane stats fold to (C,) by a (128/C, C) reshape-sum outside.
Both views are metadata-only reshapes of contiguous NHWC.

vmap-safety (the engine vmaps decoders over the ELBO-term axis,
core/engine.py:225): no kernel reads pl.program_id — JAX's pallas batching
rule prepends the batch axis to the grid without remapping program_id
axes, so any phase/index logic would silently read the term index. Partial
sums are written per-grid-step and reduced outside instead.

Equivalent reference computation: BatchNorm2d+Swish pairs in the DCGAN
stacks, e.g. /root/reference/celeba/model.py:80-91,103-133. Correctness:
tests/test_bn_pallas.py (interpreter mode on CPU, real mode on TPU).
Opt-in via MVAE_PALLAS_BN=1 (see nn/dcgan.py); measured win/loss is
recorded in BASELINE.md before any default flip.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def use_pallas_bn() -> bool:
    return (os.environ.get("MVAE_PALLAS_BN") == "1"
            and len(jax.devices()) == 1)


def _view2d(c: int, numel: int):
    """Return (rows, lanes, fold) for the 2-D lane-aligned view."""
    if c >= _LANES:
        if c % _LANES:
            raise ValueError(f"C={c} not a multiple of {_LANES}")
        return numel // c, c, 1
    if _LANES % c == 0 and numel % _LANES == 0:
        return numel // _LANES, _LANES, _LANES // c
    # ragged fallback: lane-pad C (correct everywhere, wasteful for C<<128)
    return numel // c, c, 1


def _row_block(r: int, lanes: int, itemsize: int) -> int:
    """Largest divisor of r whose (block, lanes) tile stays under ~2 MB.

    TPU lowering requires the sublane (second-to-last) block dim to be a
    multiple of the dtype's sublane quantum (8 for f32, 16 for bf16) OR
    equal to the full array dim, so only such divisors qualify; when r has
    no aligned divisor under the cap, fall back to the whole array as one
    block (legal at any r; these activations are far under VMEM then,
    because an unaligned r is a small FC/BN1d shape, not a conv map).
    """
    quantum = {4: 8, 2: 16, 1: 32}.get(itemsize, 8)
    cap = max(1, (2 << 20) // (lanes * itemsize))
    best = 0
    for d in range(1, int(r ** 0.5) + 1):
        if r % d == 0:
            for cand in (d, r // d):
                if cand <= cap and cand > best and cand % quantum == 0:
                    best = cand
    return best if best else r


def _k_moments(x_ref, s_ref, q_ref):
    # Partial sums land in an (8, lanes) block (TPU sublane minimum for
    # f32 output tiling) — broadcast the row so every sublane is valid.
    xf = x_ref[:].astype(jnp.float32)
    s_ref[:] = jnp.broadcast_to(jnp.sum(xf, axis=0, keepdims=True),
                                s_ref.shape)
    q_ref[:] = jnp.broadcast_to(jnp.sum(xf * xf, axis=0, keepdims=True),
                                q_ref.shape)


def _k_normalize(x_ref, a_ref, b_ref, y_ref):
    z = x_ref[:].astype(jnp.float32) * a_ref[:] + b_ref[:]
    y_ref[:] = (z * jax.nn.sigmoid(z)).astype(y_ref.dtype)


def _k_bwd_partials(x_ref, g_ref, a_ref, b_ref, sdz_ref, sdzx_ref):
    xf = x_ref[:].astype(jnp.float32)
    z = xf * a_ref[:] + b_ref[:]
    s = jax.nn.sigmoid(z)
    dz = g_ref[:].astype(jnp.float32) * (s * (1.0 + z * (1.0 - s)))
    sdz_ref[:] = jnp.broadcast_to(jnp.sum(dz, axis=0, keepdims=True),
                                  sdz_ref.shape)
    # xhat = (z - beta~) ... accumulate against x directly and shift
    # outside: sum(dz * xhat) = (sum(dz*x) - mean*sum(dz)) * invstd
    sdzx_ref[:] = jnp.broadcast_to(jnp.sum(dz * xf, axis=0, keepdims=True),
                                   sdzx_ref.shape)


def _k_dx(x_ref, g_ref, a_ref, b_ref, p_ref, q_ref, r_ref, dx_ref):
    xf = x_ref[:].astype(jnp.float32)
    z = xf * a_ref[:] + b_ref[:]
    s = jax.nn.sigmoid(z)
    dz = g_ref[:].astype(jnp.float32) * (s * (1.0 + z * (1.0 - s)))
    dx_ref[:] = (p_ref[:] * dz + q_ref[:] + r_ref[:] * xf).astype(dx_ref.dtype)


def _tile_lanes(v, fold):
    """(C,) f32 -> (1, lanes) with the channel pattern repeated `fold`x."""
    return jnp.tile(v, (fold,))[None, :]


def _moments(x2, r, lanes, tr):
    rb = r // tr
    sums, sqs = pl.pallas_call(
        _k_moments,
        grid=(rb,),
        in_specs=[pl.BlockSpec((tr, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((8, lanes), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rb * 8, lanes), jnp.float32)] * 2,
        interpret=_interpret(),
    )(x2)
    # Each 8-row block holds one partial, broadcast; row 0 of each suffices.
    return (jnp.sum(sums.reshape(rb, 8, lanes)[:, 0], axis=0),
            jnp.sum(sqs.reshape(rb, 8, lanes)[:, 0], axis=0))  # (lanes,)


def _normalize(x2, a, b, r, lanes, tr, out_dtype):
    rb = r // tr
    vec = pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _k_normalize,
        grid=(rb,),
        in_specs=[pl.BlockSpec((tr, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM), vec, vec],
        out_specs=pl.BlockSpec((tr, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, lanes), out_dtype),
        interpret=_interpret(),
    )(x2, a, b)


def _bwd_partials(x2, g2, a, b, r, lanes, tr):
    rb = r // tr
    vec = pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((tr, lanes), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    sdz, sdzx = pl.pallas_call(
        _k_bwd_partials,
        grid=(rb,),
        in_specs=[blk, blk, vec, vec],
        out_specs=[pl.BlockSpec((8, lanes), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rb * 8, lanes), jnp.float32)] * 2,
        interpret=_interpret(),
    )(x2, g2, a, b)
    return (jnp.sum(sdz.reshape(rb, 8, lanes)[:, 0], axis=0),
            jnp.sum(sdzx.reshape(rb, 8, lanes)[:, 0], axis=0))


def _dx(x2, g2, a, b, p, q, rr, r, lanes, tr, out_dtype):
    rb = r // tr
    vec = pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((tr, lanes), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _k_dx,
        grid=(rb,),
        in_specs=[blk, blk, vec, vec, vec, vec, vec],
        out_specs=pl.BlockSpec((tr, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, lanes), out_dtype),
        interpret=_interpret(),
    )(x2, g2, a, b, p, q, rr)


def _fold_lanes(v, fold, c):
    """(lanes,) per-lane sums -> (C,) per-channel sums."""
    if fold == 1:
        return v
    return jnp.sum(v.reshape(fold, c), axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_swish_train(x, scale, bias, eps=1e-5):
    """Fused train-mode BatchNorm + swish over the last axis of x.

    x: (..., C) activation (f32 or bf16); scale, bias: (C,) f32.
    Returns (y, mean, var): y = swish(batchnorm(x)) in x.dtype, mean/var
    the (C,) f32 biased batch moments (one-pass form) for the EMA commit.
    """
    y, mean, var, _ = _fwd_impl(x, scale, bias, eps)
    return y, mean, var


def _fwd_impl(x, scale, bias, eps):
    c = x.shape[-1]
    numel = x.size
    r, lanes, fold = _view2d(c, numel)
    tr = _row_block(r, lanes, x.dtype.itemsize)
    x2 = x.reshape(r, lanes)
    n = numel // c
    s, q = _moments(x2, r, lanes, tr)
    s, q = _fold_lanes(s, fold, c), _fold_lanes(q, fold, c)
    mean = s / n
    var = jnp.maximum(q / n - mean * mean, 0.0)
    invstd = jax.lax.rsqrt(var + eps)
    a = scale * invstd                       # (C,)
    b = bias - mean * a
    y2 = _normalize(x2, _tile_lanes(a, fold), _tile_lanes(b, fold),
                    r, lanes, tr, x.dtype)
    return y2.reshape(x.shape), mean, var, (a, b, mean, invstd)


def _vjp_fwd(x, scale, bias, eps):
    y, mean, var, res = _fwd_impl(x, scale, bias, eps)
    a, b, _, invstd = res
    return (y, mean, var), (x, scale, a, b, mean, invstd)


def _vjp_bwd(eps, residuals, cotangents):
    g, g_mean, g_var = cotangents
    x, scale, a, b, mean, invstd = residuals
    c = x.shape[-1]
    numel = x.size
    r, lanes, fold = _view2d(c, numel)
    tr = _row_block(r, lanes, x.dtype.itemsize)
    n = numel // c
    x2 = x.reshape(r, lanes)
    g2 = g.reshape(r, lanes)
    av, bv = _tile_lanes(a, fold), _tile_lanes(b, fold)
    sdz, sdzx = _bwd_partials(x2, g2, av, bv, r, lanes, tr)
    sdz, sdzx = _fold_lanes(sdz, fold, c), _fold_lanes(sdzx, fold, c)
    # sum(dz * xhat) from the raw sum(dz * x)
    sdzxh = (sdzx - mean * sdz) * invstd
    dscale = sdzxh
    dbias = sdz
    # dx = P*dz + Q + R*xhat, xhat expressed through x:
    #   xhat = (x - mean) * invstd  =>  R*xhat = (R*invstd)*x - R*invstd*mean
    p = a                                                     # scale*invstd
    base_q = -(a * sdz) / n + g_mean / n
    base_r = -(a * sdzxh) / n + 2.0 * g_var / (n * jnp.maximum(invstd, 1e-30))
    # fold xhat form into x form for the kernel: R*xhat + Q =
    #   (base_r*invstd) * x + (base_q - base_r*invstd*mean)
    r_x = base_r * invstd
    q_x = base_q - r_x * mean
    dx2 = _dx(x2, g2, av, bv, _tile_lanes(p, fold), _tile_lanes(q_x, fold),
              _tile_lanes(r_x, fold), r, lanes, tr, x.dtype)
    return dx2.reshape(x.shape), dscale, dbias


bn_swish_train.defvjp(_vjp_fwd, _vjp_bwd)
