"""GRU primitives (torch gate semantics) built on lax.scan.

Gate math (torch nn.GRU, gates laid out [r|z|n]):
    r  = sigmoid(x@W_ir + b_ir + h@W_hr + b_hr)
    z  = sigmoid(x@W_iz + b_iz + h@W_hz + b_hz)
    n  = tanh  (x@W_in + b_in + r * (h@W_hn + b_hn))
    h' = (1 - z) * n + z * h

Used by the MultiMNIST text modality: a 1-layer bidirectional encoder GRU and
a 2-layer autoregressive decoder GRU (/root/reference/multimnist/model.py:
145-235). The 4-step decode loop is a lax.scan with argmax feedback — no
Python-level recurrence survives tracing.
"""

import jax
import jax.numpy as jnp


def gru_cell(p, x, h):
    """One step. x: (B, D_in), h: (B, H) -> h': (B, H)."""
    gi = x @ p["w_ih"] + p["b_ih"]       # (B, 3H)
    gh = h @ p["w_hh"] + p["b_hh"]       # (B, 3H)
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_layer(p, xs, h0):
    """Scan a GRU over time. xs: (T, B, D_in), h0: (B, H) -> (ys (T,B,H), hT)."""
    def step(h, x):
        h = gru_cell(p, x, h)
        return h, h
    hT, ys = jax.lax.scan(step, h0, xs)
    return ys, hT


def bigru_last_step(p_fwd, p_bwd, xs):
    """Bidirectional GRU; returns the LAST timestep's (h_fwd, h_bwd) pair.

    Matches torch `output[-1]` of a bidirectional GRU: the forward hidden
    after the full sequence, and the backward hidden after seeing only the
    final element (the backward scan's first step).
    """
    B = xs.shape[1]
    H = p_fwd["w_hh"].shape[0]
    h0 = jnp.zeros((B, H), xs.dtype)
    _, h_fwd = gru_layer(p_fwd, xs, h0)
    h_bwd = gru_cell(p_bwd, xs[-1], h0)
    return h_fwd, h_bwd
