"""Vision model: 6-modality shapes, 7-term step, BCE/6 weighting parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from mvae_tpu.core.engine import multi_term_elbo
from mvae_tpu.core.losses import kl_divergence
from mvae_tpu.core.poe import masked_product_of_experts
from mvae_tpu.models.vision import VisionMVAE, MODALITIES, CHANNELS
from mvae_tpu.train.loop import make_train_step

MASKS = np.concatenate([np.ones((1, 6), np.float32),
                        np.eye(6, dtype=np.float32)])
LAMBDAS = np.full((7, 6), 1.0 / 6.0, np.float32)


def _batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    return {m: jnp.asarray(rng.random((b, 64, 64, CHANNELS[m]), np.float32))
            for m in MODALITIES}


@pytest.mark.slow
def test_vision_shapes_and_step():
    model = VisionMVAE(8)
    params, state = model.init(jax.random.key(0))
    batch = _batch()
    mu, logvar, _ = model.encode(params, state, batch, jax.random.key(1), True)
    assert mu.shape == (6, 2, 8)
    recons, _ = model.decode(params, state, jnp.zeros((2, 8)), None, False)
    for m in MODALITIES:
        assert recons[m].shape == (2, 64, 64, CHANNELS[m]), m

    tx = optax.adam(1e-4)
    step = make_train_step(model, tx, MASKS, LAMBDAS)
    _, _, _, _, loss, per_term = step(params, state, tx.init(params),
                                      jax.random.key(2), batch, 0.5)
    assert per_term.shape == (7,)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_vision_joint_term_matches_reference_formula():
    """joint ELBO == mean(sum_m BCE_m / 6 + beta*KLD) (vision/train.py:57)."""
    model = VisionMVAE(8)
    params, state = model.init(jax.random.key(0))
    batch = _batch(seed=3)
    beta = 0.7
    total, _, _ = multi_term_elbo(
        model, params, state, batch, jnp.asarray(MASKS[:1]),
        jnp.asarray(LAMBDAS[:1]), None, beta, train=False)

    mu, logvar, _ = model.encode(params, state, batch, None, False)
    pd_mu, pd_lv = masked_product_of_experts(mu, logvar, jnp.ones(6))
    recons, _ = model.decode(params, state, pd_mu, None, False)
    bce = sum(model.recon_loss(m, recons[m], batch[m]) for m in MODALITIES)
    want = jnp.mean(bce / 6.0 + beta * kl_divergence(pd_mu, pd_lv))
    np.testing.assert_allclose(float(total), float(want), rtol=1e-5)


def test_vision_unimodal_term_reconstructs_all_modalities():
    """A unimodal posterior term must score ALL six reconstructions
    (vision/train.py:227-283: model(image=image) decodes every modality and
    elbo_loss receives all six pairs), so the recon mask is all-ones while
    the posterior mask selects one expert."""
    model = VisionMVAE(8)
    params, state = model.init(jax.random.key(0))
    batch = _batch(seed=5)
    beta = 0.3
    # term: posterior from modality 0 only, reconstruct everything
    pmask = jnp.asarray(MASKS[1:2])                   # image-only posterior
    rmask = jnp.ones((1, 6), jnp.float32)
    total, _, _ = multi_term_elbo(
        model, params, state, batch, pmask, jnp.asarray(LAMBDAS[:1]),
        None, beta, train=False, recon_masks=rmask)

    mu, logvar, _ = model.encode(params, state, batch, None, False)
    pd_mu, pd_lv = masked_product_of_experts(mu, logvar, pmask[0])
    recons, _ = model.decode(params, state, pd_mu, None, False)
    bce = sum(model.recon_loss(m, recons[m], batch[m]) for m in MODALITIES)
    want = jnp.mean(bce / 6.0 + beta * kl_divergence(pd_mu, pd_lv))
    np.testing.assert_allclose(float(total), float(want), rtol=1e-5)

    # and with recon_masks omitted it degrades to the coupled (wrong-for-
    # vision) objective: only modality 0's BCE counts
    got_coupled, _, _ = multi_term_elbo(
        model, params, state, batch, pmask, jnp.asarray(LAMBDAS[:1]),
        None, beta, train=False)
    only0 = model.recon_loss(MODALITIES[0], recons[MODALITIES[0]],
                             batch[MODALITIES[0]])
    want0 = jnp.mean(only0 / 6.0 + beta * kl_divergence(pd_mu, pd_lv))
    np.testing.assert_allclose(float(got_coupled), float(want0), rtol=1e-5)
