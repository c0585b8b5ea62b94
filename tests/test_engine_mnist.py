"""Engine semantics: the batched multi-term step must equal a naive
per-term implementation (the reference's flow, mnist/train.py:200-214),
and training must reduce the loss on structured synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from mvae_tpu.core.engine import multi_term_elbo
from mvae_tpu.core.losses import kl_divergence
from mvae_tpu.core.poe import masked_product_of_experts
from mvae_tpu.data.mnist import synthetic_mnist
from mvae_tpu.models.mnist import MnistMVAE
from mvae_tpu.train.loop import make_train_step, make_eval_step

MASKS = jnp.asarray([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
LAMBDAS = jnp.asarray([[1.0, 10.0]] * 3)


def _setup(batch=16, n_latents=8):
    model = MnistMVAE(n_latents)
    params, state = model.init(jax.random.key(0))
    imgs, labels = synthetic_mnist(batch, seed=3)
    batch_d = {"image": jnp.asarray(imgs.reshape(batch, 784)),
               "text": jnp.asarray(labels)}
    return model, params, state, batch_d


def _naive_elbo(model, params, state, batch, beta):
    """Per-term eval-mode ELBO, reference-style: one fuse+decode per term."""
    mu, logvar, _ = model.encode(params, state, batch, None, False)
    total = 0.0
    for t in range(MASKS.shape[0]):
        pd_mu, pd_lv = masked_product_of_experts(mu, logvar, MASKS[t])
        z = pd_mu  # eval mode
        recons, _ = model.decode(params, state, z, None, False)
        term = beta * kl_divergence(pd_mu, pd_lv)
        for m, name in enumerate(model.modalities):
            if MASKS[t, m]:
                term = term + LAMBDAS[t, m] * model.recon_loss(
                    name, recons[name], batch[name])
        total = total + jnp.mean(term)
    return total


def test_engine_matches_naive_per_term_eval():
    model, params, state, batch = _setup()
    total, aux, _ = multi_term_elbo(model, params, state, batch, MASKS,
                                    LAMBDAS, None, 1.0, train=False)
    want = _naive_elbo(model, params, state, batch, 1.0)
    np.testing.assert_allclose(float(total), float(want), rtol=1e-5)


def test_eval_deterministic():
    model, params, state, batch = _setup()
    step = make_eval_step(model, MASKS, LAMBDAS)
    a, _ = step(params, state, batch)
    b, _ = step(params, state, batch)
    assert float(a) == float(b)


@pytest.mark.slow
def test_training_decreases_loss():
    model, params, state, _ = _setup()
    imgs, labels = synthetic_mnist(512, seed=7)
    data = {"image": jnp.asarray(imgs.reshape(512, 784)),
            "text": jnp.asarray(labels)}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, MASKS, LAMBDAS)
    rng = jax.random.key(1)
    losses = []
    for i in range(50):
        lo = (i * 64) % 448
        batch = {k: v[lo:lo + 64] for k, v in data.items()}
        params, state, opt_state, rng, loss, _ = step(
            params, state, opt_state, rng, batch, 0.01)
        losses.append(float(loss))
    # synthetic pixels carry a large irreducible BCE floor; assert a clear,
    # consistent decrease rather than an absolute factor
    assert np.mean(losses[-5:]) < 0.97 * np.mean(losses[:5]), losses[:5]
    assert min(losses) == min(losses[-10:])  # still improving near the end


def test_infer_subset_matches_term_masks():
    model, params, state, batch = _setup()
    mu, logvar, _ = model.encode(params, state, batch, None, False)
    # image-only subset through the public infer()
    i_mu, i_lv = model.infer(params, state, {"image": batch["image"]})
    m_mu, m_lv = masked_product_of_experts(mu, logvar, MASKS[1])
    np.testing.assert_allclose(np.asarray(i_mu), np.asarray(m_mu), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(i_lv), np.asarray(m_lv), rtol=1e-5)


@pytest.mark.slow
def test_exact_skip_stateless_decoders_matches_full():
    """Stateless decoders (no BN) are skipped outright for terms with zero
    static recon support — loss, per-term ELBOs, and grads must equal the
    no-support full decode exactly."""
    from mvae_tpu.models.mnist import MnistMVAE
    import functools

    model = MnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.random((6, 784), np.float32)),
             "text": jnp.asarray(rng.integers(0, 10, 6), jnp.int32)}
    support = np.asarray(MASKS, np.float32)

    def loss(p, sup):
        total, aux, _ = multi_term_elbo(
            model, p, state, batch, jnp.asarray(MASKS), jnp.asarray(LAMBDAS),
            jax.random.key(3), 0.7, train=True, recon_support=sup)
        return total, aux["per_term"]

    (l0, pt0), g0 = jax.value_and_grad(loss, has_aux=True)(params, None)
    (l1, pt1), g1 = jax.value_and_grad(loss, has_aux=True)(params, support)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pt0), np.asarray(pt1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)
