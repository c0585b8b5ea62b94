import jax.numpy as jnp
import numpy as np

from mvae_tpu.core.poe import product_of_experts, masked_product_of_experts

EPS = 1e-8


def _dense_with_prior(mu, logvar):
    """Prepend the N(0, I) prior row, then dense PoE — the reference's exact
    flow (mnist/model.py:46-64)."""
    prior_mu = np.zeros((1,) + mu.shape[1:], np.float32)
    prior_lv = np.zeros((1,) + mu.shape[1:], np.float32)
    return product_of_experts(jnp.concatenate([jnp.asarray(prior_mu), mu]),
                              jnp.concatenate([jnp.asarray(prior_lv), logvar]))


def test_two_gaussian_closed_form():
    # product of N(m1, v1), N(m2, v2): var = 1/(1/v1 + 1/v2), mu = var*(m1/v1+m2/v2)
    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    pd_mu, pd_logvar = product_of_experts(mu, logvar)
    v = np.exp(np.asarray(logvar)) + EPS
    t = 1.0 / v
    want_var = 1.0 / t.sum(0)
    want_mu = want_var * (np.asarray(mu) * t).sum(0)
    np.testing.assert_allclose(pd_mu, want_mu, rtol=1e-5)
    np.testing.assert_allclose(np.exp(pd_logvar), want_var, rtol=1e-5)


def test_masked_all_ones_equals_dense_with_prior():
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.normal(size=(3, 4, 6)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(3, 4, 6)).astype(np.float32))
    m_mu, m_lv = masked_product_of_experts(mu, logvar, jnp.ones(3))
    d_mu, d_lv = _dense_with_prior(mu, logvar)
    np.testing.assert_allclose(m_mu, d_mu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m_lv, d_lv, rtol=1e-5, atol=1e-6)


def test_masked_subset_equals_dense_on_subset():
    rng = np.random.default_rng(2)
    mu = jnp.asarray(rng.normal(size=(4, 2, 8)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(4, 2, 8)).astype(np.float32))
    mask = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    m_mu, m_lv = masked_product_of_experts(mu, logvar, mask)
    d_mu, d_lv = _dense_with_prior(mu[jnp.asarray([0, 2])],
                                   logvar[jnp.asarray([0, 2])])
    np.testing.assert_allclose(m_mu, d_mu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m_lv, d_lv, rtol=1e-5, atol=1e-6)


def test_prior_only_mask():
    mu = jnp.ones((2, 3, 4))
    logvar = jnp.zeros((2, 3, 4))
    m_mu, m_lv = masked_product_of_experts(mu, logvar, jnp.zeros(2))
    # only the prior expert: N(0, 1/(1+eps)) up to the eps convention
    np.testing.assert_allclose(m_mu, np.zeros((3, 4)), atol=1e-6)
    np.testing.assert_allclose(np.exp(m_lv), np.full((3, 4), 1.0), atol=1e-4)
