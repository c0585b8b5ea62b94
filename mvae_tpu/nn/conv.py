"""NHWC convolutions with PyTorch size semantics.

The framework is NHWC end-to-end (TPU's native layout); kernels are HWIO.
Size semantics match the reference's nn.Conv2d / nn.ConvTranspose2d so the
architecture tables in SURVEY.md §2.2 carry over:

  conv2d:          out = floor((in + 2p - k)/s) + 1
  conv_transpose:  out = (in - 1)*s - 2p + k

Two lowerings for the transposed conv:

  * dilated (default): `lax.conv_transpose(transpose_kernel=True)` — the
    input is base-dilated by `stride` (zeros inserted) and correlated with
    the flipped kernel. For stride 2 this multiplies ~75% zeros.
  * phased (`MVAE_CONVT_PHASED=1`): subpixel / phase decomposition — each
    output phase r (t = s*q + r) only ever touches the kernel taps
    m ≡ (r + padding) (mod s), so the transposed conv is exactly s*s
    stride-1 convolutions with the strided sub-kernels, interleaved by a
    depth-to-space reshape. Same math, zero wasted multiplies.
"""

import os

import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def _phased_enabled() -> bool:
    return os.environ.get("MVAE_CONVT_PHASED") == "1"


def _phase_plan(in_len: int, k: int, s: int, p: int):
    """Per-phase (sub-kernel start e, conv padding (pl, ph), out length o_r)
    for one spatial dim, or None if this (k, s, p) needs the dilated path.

    Derivation: torch ConvTranspose1d is y[t] = sum_j x[j] * w[t + p - s*j]
    over valid kernel indices. Writing t = s*q + r and m = s*u + e with
    e = (r+p) % s, d = (r+p) // s gives y[s*q+r] = sum_u x[q+d-u] * w[s*u+e]
    — a stride-1 correlation of x with the REVERSED sub-kernel w[e::s],
    left-padded by L-1-d and right-padded to the phase's output length.
    """
    o = (in_len - 1) * s - 2 * p + k
    plan = []
    for r in range(s):
        d, e = divmod(r + p, s)
        L = len(range(e, k, s))
        o_r = max(0, -(-(o - r) // s))  # ceil((o - r)/s), #outputs t≡r (mod s)
        pl = L - 1 - d
        ph = o_r - in_len + d
        if L == 0 or pl < 0 or ph < 0:
            return None  # exotic (k, s, p); use the dilated lowering
        plan.append((e, pl, ph, o_r))
    return plan


def _conv_transpose2d_phased(w, x, *, stride: int, padding: int):
    s = stride
    H, W = x.shape[1], x.shape[2]
    k = w.shape[0]
    plan_h = _phase_plan(H, k, s, padding)
    plan_w = _phase_plan(W, k, s, padding)
    if plan_h is None or plan_w is None:
        return None
    o_h = (H - 1) * s - 2 * padding + k
    o_w = (W - 1) * s - 2 * padding + k
    Hq, Wq = -(-o_h // s), -(-o_w // s)
    rows = []
    for (eh, plh, phh, ohr) in plan_h:
        cols = []
        for (ew, plw, phw, owr) in plan_w:
            # stored layout is (k, k, c_out, c_in) (initializers.py:53);
            # the stride-1 correlation needs HWIO with I = this op's c_in
            v = w[eh::s, ew::s][::-1, ::-1].transpose(0, 1, 3, 2)
            y = lax.conv_general_dilated(
                x, v, window_strides=(1, 1),
                padding=((plh, phh), (plw, phw)),
                dimension_numbers=_DIMS)
            # pad ragged phases (k % s != 0) up to the (Hq, Wq) grid
            if ohr < Hq or owr < Wq:
                y = jnp.pad(y, ((0, 0), (0, Hq - ohr), (0, Wq - owr), (0, 0)))
            cols.append(y)
        rows.append(jnp.stack(cols, axis=3))        # (B, Hq, Wq, s, C)
    y = jnp.stack(rows, axis=2)                     # (B, Hq, s, Wq, s, C)
    y = y.reshape(y.shape[0], Hq * s, Wq * s, y.shape[-1])
    return y[:, :o_h, :o_w, :]


def conv2d(params, x, *, stride: int, padding: int):
    y = lax.conv_general_dilated(
        x, params["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMS,
    )
    if "b" in params:
        y = y + params["b"]
    return y


def conv_transpose2d(params, x, *, stride: int, padding: int):
    """Matches torch ConvTranspose2d(k, stride, padding).

    Implemented as the transposed conv: input dilated by `stride`, padded
    with (k - 1 - p) on each side, correlated with the spatially-flipped
    kernel. lax.conv_transpose(transpose_kernel=True) does exactly this and
    keeps HWIO I=c_in, O=c_out layout.
    """
    y = None
    if stride > 1 and _phased_enabled():
        y = _conv_transpose2d_phased(params["w"], x,
                                     stride=stride, padding=padding)
    if y is None:
        k = params["w"].shape[0]
        pad = k - 1 - padding
        y = lax.conv_transpose(
            x, params["w"],
            strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=_DIMS,
            transpose_kernel=True,
        )
    if "b" in params:
        y = y + params["b"]
    return y
