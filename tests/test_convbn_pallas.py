"""Fused conv2d+BN-moments kernel (ops/convbn_pallas.py) == the stock
lax conv + jnp reductions, values and gradients, both supported shapes.

Runs the Pallas kernels in interpreter mode on CPU (like
tests/test_bn_pallas.py); real TPU lowering is exercised by the hardware
A/B (BASELINE.md conv+BN epilogue section).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # opt-in Pallas conv+BN kernel suite

from mvae_tpu.nn.conv import conv2d
from mvae_tpu.ops.convbn_pallas import conv2d_moments, supported

# (B, H, W, Cin, Cout, stride, pad) — the DCGAN table's BN'd conv shapes
# (celeba/model.py:79-87 equivalents), batch shrunk for CPU
CASES = [
    (6, 32, 32, 32, 64, 2, 1),    # celeba enc L2
    (6, 16, 16, 64, 128, 2, 1),   # celeba enc L3
    (6, 8, 8, 128, 256, 1, 0),    # celeba enc L4 (stride 1)
    (4, 50, 50, 1, 32, 2, 1),     # multimnist enc L1 (odd spatial -> pad)
]


def _ref(x, w, stride, pad):
    y = conv2d({"w": w}, x, stride=stride, padding=pad)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))


@pytest.mark.parametrize("case", CASES, ids=["L2", "L3", "L4", "mm1"])
def test_forward_matches_lax(case):
    b, h, wd, cin, cout, s, p = case
    assert supported((b, h, wd, cin), 4, s, p)
    key = jax.random.key(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (b, h, wd, cin), jnp.float32)
    w = jax.random.normal(kw, (4, 4, cin, cout), jnp.float32) * 0.05
    y, ms, mq = jax.jit(conv2d_moments, static_argnums=(2, 3))(x, w, s, p)
    yr, sr, qr = _ref(x, w, s, p)
    np.testing.assert_allclose(y, yr, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ms, sr, rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(mq, qr, rtol=2e-5, atol=1e-3)


def test_unsupported_shapes_refused():
    # odd spatial at stride 2 and non-4 kernels fall back to the lax path
    assert not supported((4, 7, 7, 8), 4, 2, 1)
    assert not supported((4, 8, 8, 8), 3, 2, 1)
    assert not supported((4, 8, 8, 8), 4, 2, 0)


def test_grads_match_composite():
    b, h, wd, cin, cout, s, p = CASES[0]
    kx, kw, kg = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(kx, (b, h, wd, cin), jnp.float32)
    w = jax.random.normal(kw, (4, 4, cin, cout), jnp.float32) * 0.05
    # scalar loss exercising all three outputs (incl. the moment cotangents
    # the custom_vjp folds into dy)
    cy = jax.random.normal(kg, (cout,), jnp.float32)

    def loss(fn):
        def f(x_, w_):
            y, ms, mq = fn(x_, w_, s, p)
            return (jnp.sum(y * y) * 1e-3 + jnp.sum(ms * cy)
                    + jnp.sum(mq) * 1e-4)
        return f

    gx, gw = jax.grad(loss(conv2d_moments), argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(
        loss(lambda x_, w_, s_, p_: _ref(x_, w_, s_, p_)),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, gx_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(gw, gw_r, rtol=2e-4, atol=2e-4)


def test_bf16_path_dtypes_and_values():
    b, h, wd, cin, cout, s, p = CASES[1]
    kx, kw = jax.random.split(jax.random.key(2))
    x = jax.random.normal(kx, (b, h, wd, cin), jnp.bfloat16)
    w = (jax.random.normal(kw, (4, 4, cin, cout), jnp.float32)
         * 0.05).astype(jnp.bfloat16)
    y, ms, mq = jax.jit(conv2d_moments, static_argnums=(2, 3))(x, w, s, p)
    assert y.dtype == jnp.bfloat16 and ms.dtype == jnp.float32
    yr, _, _ = _ref(x, w, s, p)
    np.testing.assert_allclose(np.float32(y), np.float32(yr),
                               rtol=2e-2, atol=2e-2)
    # moments are over the MATERIALIZED bf16 y (default-path semantics)
    yf = np.float32(y)
    np.testing.assert_allclose(ms, yf.sum((0, 1, 2)), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(mq, (yf * yf).sum((0, 1, 2)),
                               rtol=1e-3, atol=1e-2)


def test_conv_stack_fused_equals_default(monkeypatch):
    """conv_stack_apply under MVAE_CONVBN_PALLAS=1 == the default path
    (values + new BN state) on the celeba encoder spec."""
    monkeypatch.setenv("MVAE_CONVBN_PALLAS", "1")
    import mvae_tpu.nn.dcgan as dcgan
    importlib.reload(dcgan)  # no caching expected; reload defensively
    from mvae_tpu.models.celeba import ENC_SPECS
    key = jax.random.key(3)
    params, state = dcgan.conv_stack_init(key, 3, ENC_SPECS)
    x = jax.random.uniform(jax.random.key(4), (6, 64, 64, 3))

    def run():
        return dcgan.conv_stack_apply(params, state, ENC_SPECS, x,
                                      train=True)

    y1, st1 = run()
    monkeypatch.setenv("MVAE_CONVBN_PALLAS", "0")
    y0, st0 = run()
    np.testing.assert_allclose(y1, y0, rtol=3e-5, atol=3e-5)
    for a, bst in zip(jax.tree.leaves(st1), jax.tree.leaves(st0)):
        np.testing.assert_allclose(a, bst, rtol=3e-5, atol=3e-5)
