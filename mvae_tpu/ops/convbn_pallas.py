"""Pallas TPU kernel: conv2d forward with a fused BN-moments epilogue.

ROADMAP #2's named candidate (VERDICT r3 next-step 2): every BN'd conv in
the DCGAN stacks (reference celeba/model.py:77-100, multimnist/model.py:
75-111, vision/model.py:109-145) is followed by train-mode BatchNorm, whose
batch moments cost a separate VPU reduction pass over the conv output
(~260 us/step on the celeba trace, BASELINE.md roofline section). XLA
cannot fuse a channel reduction into a convolution's output write; this
kernel computes the conv AND the per-channel sum / sum-of-squares in one
pass, so the moment read of y never happens.

Conv lowering: phase decomposition. For stride s, kernel k, pad p with
k == 2s or s == 1, every tap (kh, kw) of the conv reads a UNIT-offset
slab of one input "phase":

  y[b, oh, ow, :] = sum_t phases[p_t][b, oh + a_t, ow + b_t, :] @ W_t

where for stride 2 the 4 phases are the parity-interleaved views of the
padded input (xpad index 2*oh + kh -> phase kh % 2, offset kh // 2), and
for stride 1 the single phase is the padded input itself (offset kh).
The kernel unrolls the k*k taps as MXU matmuls accumulating in f32 and
writes y plus per-grid-block moment partials; mean/var/EMA and the
normalize+swish stay in jnp (nn/norm.py:batchnorm_swish_from_moments) so
XLA keeps its normalize+swish fusion — the only change vs the default
path is that the moments arrive for free with the conv.

Backward is NOT hand-written: a custom_vjp folds the three cotangents
(gy, gsum, gsumsq) into one upstream dy = gy + gsum + 2*y*gsumsq (an
elementwise XLA fusion) and defers to jax.vjp of the stock lax conv for
dx/dw — bit-comparable to the unfused backward.

vmap-safety: no kernel reads pl.program_id (same rule as ops/bn_pallas.py)
so the decoder term-vmap can batch it by grid-prepending.

Opt-in via MVAE_CONVBN_PALLAS=1 (read at trace time by nn/dcgan.py);
measured win/loss on the v5e is recorded in BASELINE.md either way.
Correctness: tests/test_convbn_pallas.py (interpreter on CPU, real
lowering exercised by the TPU A/B script).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvae_tpu.nn.conv import conv2d as _lax_conv2d


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def use_convbn_pallas() -> bool:
    return (os.environ.get("MVAE_CONVBN_PALLAS") == "1"
            and len(jax.devices()) == 1)


def supported(x_shape, k: int, stride: int, padding: int) -> bool:
    """Shapes this kernel handles: the DCGAN table's 4x4 stride-2 pad-1 and
    4x4 stride-1 pad-0 convs (NHWC)."""
    if len(x_shape) != 4:
        return False
    _, h, w, _ = x_shape
    if stride == 2 and k == 4 and padding == 1:
        return h % 2 == 0 and w % 2 == 0
    if stride == 1 and k == 4 and padding == 0:
        return h >= k and w >= k
    return False


def _out_hw(h: int, k: int, s: int, p: int) -> int:
    return (h + 2 * p - k) // s + 1


def _phases_and_plan(x, k: int, stride: int, padding: int):
    """Return (phases, plan): phases (P, B, Hp, Wp, C); plan[t] = (p, a, b)
    so tap t's slab is phases[p][:, a:a+OH, b:b+OW, :]."""
    b, h, w, c = x.shape
    if stride == 2:
        # xpad index for output oh, tap kh is 2*oh + kh (pad folds the -p)
        xpad = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding),
                           (0, 0)))
        hp, wp = (h + 2 * padding) // 2, (w + 2 * padding) // 2
        ph = xpad.reshape(b, hp, 2, wp, 2, c).transpose(2, 4, 0, 1, 3, 5)
        phases = ph.reshape(4, b, hp, wp, c)
        plan = [(2 * (kh % 2) + (kw % 2), kh // 2, kw // 2)
                for kh in range(k) for kw in range(k)]
    else:
        xpad = x if padding == 0 else jnp.pad(
            x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
        phases = xpad[None]
        plan = [(0, kh, kw) for kh in range(k) for kw in range(k)]
    return phases, plan


def _pick_tb(b: int, per_item_bytes: int, cap: int = 6 << 20) -> int:
    """Largest divisor of B whose block stays under ~6 MB of (padded) VMEM."""
    best = 1
    for d in range(1, b + 1):
        if b % d == 0 and d * per_item_bytes <= cap:
            best = d
    return best


def _phys_rows(n: int, q: int = 8) -> int:
    return -(-n // q) * q


def _phys_lanes(n: int) -> int:
    return -(-n // 128) * 128


def _make_kernel(plan, tb, oh, ow, cin, cout):
    m = tb * oh * ow

    def _k(ph_ref, w_ref, y_ref, s_ref, q_ref):
        acc = jnp.zeros((m, cout), jnp.float32)
        for t, (p, a, b) in enumerate(plan):
            slab = ph_ref[p, :, a:a + oh, b:b + ow, :].reshape(m, cin)
            acc = acc + jnp.dot(slab, w_ref[t],
                                preferred_element_type=jnp.float32)
        # moments are taken over the MATERIALIZED y values (matching the
        # default path, which reduces the stored conv output), so cast
        # first when the compute dtype narrows
        yv = acc.astype(y_ref.dtype)
        y_ref[:] = yv.reshape(tb, oh, ow, cout)
        yf = yv.astype(jnp.float32)
        s_ref[:] = jnp.broadcast_to(
            jnp.sum(yf, axis=0, keepdims=True), s_ref.shape)
        q_ref[:] = jnp.broadcast_to(
            jnp.sum(yf * yf, axis=0, keepdims=True), q_ref.shape)

    return _k


def _fwd_impl(x, w, stride, padding):
    b, h, wd, cin = x.shape
    k = w.shape[0]
    cout = w.shape[-1]
    oh, ow = _out_hw(h, k, stride, padding), _out_hw(wd, k, stride, padding)
    phases, plan = _phases_and_plan(x, k, stride, padding)
    p_cnt, _, hp, wp, _ = phases.shape
    wt = w.reshape(k * k, cin, cout)

    isz = x.dtype.itemsize
    per_item = (p_cnt * hp * _phys_rows(wp) * _phys_lanes(cin) * isz       # in
                + oh * _phys_rows(ow) * _phys_lanes(cout) * isz            # y
                + oh * ow * _phys_lanes(cout) * 4)                         # acc
    tb = _pick_tb(b, per_item)
    nb = b // tb

    kern = _make_kernel(plan, tb, oh, ow, cin, cout)
    y, s_p, q_p = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((p_cnt, tb, hp, wp, cin),
                         lambda i: (0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, oh, ow, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, oh, ow, cout), x.dtype),
            jax.ShapeDtypeStruct((nb * 8, cout), jnp.float32),
            jax.ShapeDtypeStruct((nb * 8, cout), jnp.float32),
        ],
        interpret=_interpret(),
    )(phases, wt)
    # each 8-row block is one broadcast partial; row 0 of each suffices
    s = jnp.sum(s_p.reshape(nb, 8, cout)[:, 0], axis=0)
    q = jnp.sum(q_p.reshape(nb, 8, cout)[:, 0], axis=0)
    return y, s, q


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_moments(x, w, stride, padding):
    """Fused conv2d + per-channel moment sums of its output.

    x: (B, H, W, Cin); w: (k, k, Cin, Cout) HWIO, no bias (the reference
    DCGAN convs are all bias=False, celeba/model.py:77-87).
    Returns (y, s, q): y the conv output in x.dtype; s = sum(y), q =
    sum(y*y) over batch+spatial per channel, f32 — exactly what
    nn/norm.py's one-pass BN needs.
    """
    return _fwd_impl(x, w, stride, padding)


def _vjp_fwd(x, w, stride, padding):
    y, s, q = _fwd_impl(x, w, stride, padding)
    return (y, s, q), (x, w, y)


def _vjp_bwd(stride, padding, res, cts):
    x, w, y = res
    gy, gs, gq = cts
    # d(sum y)/dy = 1; d(sum y^2)/dy = 2y — fold into one upstream grad
    dy = (gy.astype(jnp.float32) + gs.astype(jnp.float32)
          + 2.0 * y.astype(jnp.float32) * gq.astype(jnp.float32))
    _, vjp = jax.vjp(
        lambda x_, w_: _lax_conv2d({"w": w_}, x_, stride=stride,
                                   padding=padding), x, w)
    dx, dw = vjp(dy.astype(y.dtype))
    return dx, dw


conv2d_moments.defvjp(_vjp_fwd, _vjp_bwd)
