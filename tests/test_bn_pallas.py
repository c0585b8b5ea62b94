"""Fused BN+swish Pallas kernel vs the jnp reference (nn/norm.py one-pass
form + nn/layers.py swish), values and gradients, incl. under the term-axis
vmap the engine uses (core/engine.py:225). Interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # opt-in Pallas BN kernel suite

from mvae_tpu.nn.layers import swish
from mvae_tpu.nn.norm import batchnorm_apply
from mvae_tpu.ops.bn_pallas import bn_swish_train

EPS = 1e-5


def _ref(x, scale, bias):
    """jnp reference: one-pass train-mode BN (norm.py) then swish."""
    params = {"scale": scale, "bias": bias}
    state = {"mean": jnp.zeros_like(scale), "var": jnp.ones_like(scale)}
    y, _ = batchnorm_apply(params, state, x.astype(jnp.float32), train=True,
                           one_pass=True)
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.maximum(jnp.mean(xf * xf, axis=axes) - mean * mean, 0.0)
    return swish(y), mean, var


@pytest.mark.parametrize("shape,c", [
    ((10, 8, 8, 32), 32),      # C < 128, folded lanes
    ((6, 5, 5, 64), 64),
    ((4, 7, 7, 128), 128),     # C = lanes
    ((3, 5, 5, 256), 256),     # C > lanes
    ((100, 512), 512),         # BN1d (celeba attr MLP shape)
])
def test_forward_matches_reference(shape, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, shape), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (c,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.2, (c,)), jnp.float32)
    y, mean, var = bn_swish_train(x, scale, bias)
    ry, rmean, rvar = _ref(x, scale, bias)
    np.testing.assert_allclose(mean, rmean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(var, rvar, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y, ry, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,c", [
    ((10, 8, 8, 32), 32),
    ((4, 7, 7, 128), 128),
    ((100, 512), 512),
])
def test_gradients_match_reference(shape, c):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0.5, 1.5, shape), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (c,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.2, (c,)), jnp.float32)
    ct_y = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    ct_mean = jnp.asarray(rng.normal(0, 1, (c,)), jnp.float32)
    ct_var = jnp.asarray(rng.normal(0, 1, (c,)), jnp.float32)

    def loss_k(x, s, b):
        y, m, v = bn_swish_train(x, s, b)
        return (jnp.vdot(y, ct_y) + jnp.vdot(m, ct_mean)
                + jnp.vdot(v, ct_var))

    def loss_r(x, s, b):
        y, m, v = _ref(x, s, b)
        return (jnp.vdot(y, ct_y) + jnp.vdot(m, ct_mean)
                + jnp.vdot(v, ct_var))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gk, gr, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4,
                                   err_msg=name)


def test_bf16_input_f32_stats():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (8, 6, 6, 64)), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    y, mean, var = bn_swish_train(x, scale, bias)
    assert y.dtype == jnp.bfloat16
    assert mean.dtype == jnp.float32 and var.dtype == jnp.float32
    ry, rmean, rvar = _ref(x.astype(jnp.float32), scale, bias)
    np.testing.assert_allclose(mean, rmean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y, np.float32), ry,
                               rtol=2e-2, atol=2e-2)


def test_under_term_vmap_matches_reference():
    """The engine vmaps decoders over T ELBO terms; the kernel must stay
    correct through JAX's pallas batching rule (per-term moments)."""
    rng = np.random.default_rng(3)
    T = 3
    x = jnp.asarray(rng.normal(0, 2, (T, 6, 5, 5, 32)), jnp.float32)
    scale = jnp.asarray(rng.normal(1, 0.1, (32,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)

    yk, mk, vk = jax.vmap(lambda xt: bn_swish_train(xt, scale, bias))(x)
    yr, mr, vr = jax.vmap(lambda xt: _ref(xt, scale, bias))(x)
    np.testing.assert_allclose(mk, mr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(vk, vr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(yk, yr, rtol=1e-5, atol=1e-5)

    ct = jnp.asarray(rng.normal(0, 1, x.shape), jnp.float32)
    gk = jax.grad(lambda xx: jnp.vdot(
        jax.vmap(lambda xt: bn_swish_train(xt, scale, bias)[0])(xx), ct))(x)
    gr = jax.grad(lambda xx: jnp.vdot(
        jax.vmap(lambda xt: _ref(xt, scale, bias)[0])(xx), ct))(x)
    np.testing.assert_allclose(gk, gr, rtol=2e-4, atol=2e-4)


def test_grad_under_jit_scan():
    """Production path wraps the step in jit + lax.scan; smoke the kernel
    inside that structure."""
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.normal(0, 1, (8, 4, 4, 32)), jnp.float32)
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)

    @jax.jit
    def run(x):
        def body(carry, _):
            g = jax.grad(lambda xx: jnp.sum(
                bn_swish_train(xx, scale, bias)[0] ** 2))(carry)
            return carry - 0.01 * g, jnp.sum(g)
        return jax.lax.scan(body, x, None, length=3)

    xf, gs = run(x0)
    assert np.isfinite(np.asarray(gs)).all()
    assert xf.shape == x0.shape
