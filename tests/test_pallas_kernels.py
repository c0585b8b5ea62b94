"""Pallas kernels vs jnp references, interpreter mode on CPU, including
gradient checks (SURVEY.md §4.6)."""

import jax
import jax.numpy as jnp
import numpy as np

from mvae_tpu.core.poe import masked_product_of_experts
from mvae_tpu.ops.poe_pallas import masked_poe_all_terms
from mvae_tpu.ops.elbo_pallas import bce_sum, bce_sum_ref


def _poe_inputs(m=5, b=12, d=16, t=4, seed=0):
    rng = np.random.default_rng(seed)
    mu = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    lv = jnp.asarray(rng.normal(size=(m, b, d)).astype(np.float32))
    masks = jnp.asarray((rng.random((t, m)) < 0.6).astype(np.float32))
    return mu, lv, masks


def test_poe_kernel_matches_reference():
    mu, lv, masks = _poe_inputs()
    k_mu, k_lv = masked_poe_all_terms(mu, lv, masks)
    r_mu, r_lv = jax.vmap(masked_product_of_experts,
                          in_axes=(None, None, 0))(mu, lv, masks)
    np.testing.assert_allclose(np.asarray(k_mu), np.asarray(r_mu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(k_lv), np.asarray(r_lv),
                               rtol=1e-5, atol=1e-6)


def test_poe_kernel_grid_tiling():
    # batch larger than one tile exercises the grid path
    mu, lv, masks = _poe_inputs(m=3, b=300, d=8, t=2, seed=1)
    k_mu, k_lv = masked_poe_all_terms(mu, lv, masks)
    r_mu, r_lv = jax.vmap(masked_product_of_experts,
                          in_axes=(None, None, 0))(mu, lv, masks)
    np.testing.assert_allclose(np.asarray(k_mu), np.asarray(r_mu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(k_lv), np.asarray(r_lv),
                               rtol=1e-5, atol=1e-6)


def test_poe_kernel_gradients_match_reference():
    mu, lv, masks = _poe_inputs(m=4, b=6, d=5, t=3, seed=2)

    def loss_kernel(mu, lv):
        a, b = masked_poe_all_terms(mu, lv, masks)
        return jnp.sum(jnp.sin(a) + b * b)

    def loss_ref(mu, lv):
        a, b = jax.vmap(masked_product_of_experts,
                        in_axes=(None, None, 0))(mu, lv, masks)
        return jnp.sum(jnp.sin(a) + b * b)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(mu, lv)
    gr = jax.grad(loss_ref, argnums=(0, 1))(mu, lv)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bce_sum_matches_reference_and_grads():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(scale=3, size=(40, 100)).astype(np.float32))
    t = jnp.asarray(rng.random((40, 100)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(bce_sum(x, t)),
                               np.asarray(bce_sum_ref(x, t)),
                               rtol=1e-5, atol=1e-4)

    gk = jax.grad(lambda a: jnp.sum(bce_sum(a, t) ** 2))(x)
    gr = jax.grad(lambda a: jnp.sum(bce_sum_ref(a, t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_bce_sum_grid_tiling():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(700, 64)).astype(np.float32))
    t = jnp.asarray(rng.random((700, 64)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(bce_sum(x, t)),
                               np.asarray(bce_sum_ref(x, t)),
                               rtol=1e-5, atol=1e-4)
