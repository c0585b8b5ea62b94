"""CelebA-19: stacked-expert correctness, subset-sampler invariants
(SURVEY.md §4.1), and the 20+m-term step."""

import functools
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from mvae_tpu.core.engine import multi_term_elbo
from mvae_tpu.core.subsets import (
    sample_subset_masks, celeba19_static_terms, celeba19_step_terms)
from mvae_tpu.models.celeba19 import Celeba19MVAE, N_ATTRS
from mvae_tpu.nn.layers import swish
from mvae_tpu.train.loop import make_train_step


def _batch(b=4, seed=0):
    rng = np.random.default_rng(seed)
    return {"image": jnp.asarray(rng.random((b, 64, 64, 3), np.float32)),
            "attrs": jnp.asarray(
                (rng.random((b, N_ATTRS)) < 0.4).astype(np.float32))}


@pytest.mark.slow
def test_stacked_attr_encoder_matches_per_expert_loop():
    model = Celeba19MVAE(8)
    params, state = model.init(jax.random.key(0))
    batch = _batch()
    mu, logvar, _ = model.encode(params, state, batch, None, False)
    assert mu.shape == (19, 4, 8)

    # re-derive expert i's posterior with plain per-expert math
    pe = params["attr_enc_experts"]
    a = np.asarray(batch["attrs"])
    for i in [0, 7, 17]:
        emb = np.asarray(pe["embed"])[i][a[:, i].astype(int)]   # (B, 512)
        h = np.asarray(swish(jnp.asarray(emb)))
        h = np.asarray(swish(
            jnp.asarray(h @ np.asarray(pe["fc"]["w"][i])
                        + np.asarray(pe["fc"]["b"][i]))))
        out = h @ np.asarray(pe["head"]["w"][i]) + np.asarray(pe["head"]["b"][i])
        np.testing.assert_allclose(np.asarray(mu[1 + i]), out[:, :8],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(logvar[1 + i]), out[:, 8:],
                                   rtol=1e-4, atol=1e-5)


def test_subset_sampler_invariants():
    # accumulate over steps at the canonical approx_m=1: one call of m=500
    # would (correctly) raise, since e.g. the size-18 class only holds 19
    # distinct subsets and within-class draws are without replacement
    rng = np.random.default_rng(0)
    masks = np.concatenate(
        [sample_subset_masks(rng, 1, 19) for _ in range(500)])
    sizes = masks.sum(axis=1)
    assert sizes.min() >= 2 and sizes.max() <= 18   # no singleton/full sets
    # stratified-by-size: every size class appears over many draws
    assert len(np.unique(sizes)) == 17
    assert set(np.unique(masks)) == {0.0, 1.0}


def test_subset_sampler_no_replacement_within_size_class():
    """The reference draws WITHOUT replacement within each size class
    (celeba19/train.py:133-138): one step's sampled subsets of equal size
    are all distinct. With n=6 and many draws, duplicates would be near
    certain under independent sampling (smallest class C(6,5)=6 combos)."""
    rng = np.random.default_rng(7)
    for _ in range(50):
        masks = sample_subset_masks(rng, 6, 6)
        sizes = masks.sum(axis=1)
        assert np.all(np.diff(sizes) >= 0)      # grouped by size ascending
        for s in np.unique(sizes):
            rows = masks[sizes == s]
            assert len(np.unique(rows, axis=0)) == len(rows)
    # over-asking more distinct subsets than a class holds must raise like
    # the reference's np.random.choice(..., replace=False)
    import pytest
    with pytest.raises(ValueError):   # n=3 only has C(3,2)=3 subsets < 4
        sample_subset_masks(np.random.default_rng(0), 4, 3)


def test_term_count_invariant():
    # n_elbo_terms == (N+1) + 1 + m  (celeba19/train.py:304)
    rng = np.random.default_rng(1)
    for m in [0, 1, 5]:
        masks, lambdas = celeba19_step_terms(rng, m, N_ATTRS, 1.0, 10.0)
        assert masks.shape == ((N_ATTRS + 1) + 1 + m, 19)
        assert lambdas.shape == masks.shape
    static_m, static_l = celeba19_static_terms(N_ATTRS, 2.0, 5.0)
    assert static_m[0].sum() == 19            # complete
    assert static_m[1].sum() == 1 and static_m[1, 0] == 1   # image-only
    # single-attribute terms use default lambdas 1.0
    np.testing.assert_array_equal(static_l[2:], np.ones((18, 19)))
    assert static_l[0, 0] == 2.0 and static_l[0, 1] == 5.0


@pytest.mark.slow
def test_recon_support_grouped_decode_matches_ungrouped():
    """Dead-backward elimination (engine._decode_grouped) must not change
    loss values, per-term ELBOs, committed BN states, or gradients — terms
    with zero static support contribute exactly-zero gradients there."""
    from mvae_tpu.core.subsets import celeba19_recon_support

    model = Celeba19MVAE(6)
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    masks, lambdas = celeba19_step_terms(rng, 1, N_ATTRS, 1.0, 10.0)
    masks, lambdas = jnp.asarray(masks), jnp.asarray(lambdas)
    support = celeba19_recon_support(1, N_ATTRS)
    batch = _batch()

    def loss(p, sup):
        total, aux, st = multi_term_elbo(
            model, p, state, batch, masks, lambdas, jax.random.key(7),
            0.5, train=True, recon_support=sup)
        return total, (aux["per_term"], st)

    (l0, (pt0, st0)), g0 = jax.value_and_grad(
        loss, has_aux=True)(params, None)
    (l1, (pt1, st1)), g1 = jax.value_and_grad(
        loss, has_aux=True)(params, support)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pt0), np.asarray(pt1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
    # grads accumulate across terms in a different order after grouping:
    # pure f32 reduction noise
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-4)


@pytest.mark.slow
def test_grouped_term_loss_fusion_matches_concat_form(monkeypatch):
    """MVAE_GROUPED_TERM_LOSS=1 (default) computes recon_losses INSIDE each
    decode group so only (B, M) loss rows cross the group concat — the
    concat-then-loss form (=0) must produce the same totals, per-term
    ELBOs, committed states, and gradients (float reassociation only).
    The env var is read at trace time, so flipping it between direct
    multi_term_elbo calls re-traces both forms."""
    from mvae_tpu.core.subsets import celeba19_recon_support

    model = Celeba19MVAE(6)
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    masks, lambdas = celeba19_step_terms(rng, 2, N_ATTRS, 1.0, 10.0)
    masks, lambdas = jnp.asarray(masks), jnp.asarray(lambdas)
    support = celeba19_recon_support(2, N_ATTRS)
    batch = _batch()

    def loss(p):
        total, aux, st = multi_term_elbo(
            model, p, state, batch, masks, lambdas, jax.random.key(7),
            0.5, train=True, recon_support=support)
        return total, (aux["per_term"], st)

    monkeypatch.setenv("MVAE_GROUPED_TERM_LOSS", "1")
    (l1, (pt1, st1)), g1 = jax.value_and_grad(loss, has_aux=True)(params)
    monkeypatch.setenv("MVAE_GROUPED_TERM_LOSS", "0")
    (l0, (pt0, st0)), g0 = jax.value_and_grad(loss, has_aux=True)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pt1), np.asarray(pt0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st1),
                    jax.tree_util.tree_leaves(st0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-4)


@pytest.mark.slow
def test_gathered_expert_decode_matches_full():
    """Terms whose static support needs k < 18 attr experts decode with
    per-term GATHERED expert params (model.decode_group_key /
    decode_term_operands): loss, per-term ELBOs, committed state, and
    gradients must match the full-stack decode exactly (the other experts'
    recon weights are statically zero; the attr decoders are stateless)."""
    model = Celeba19MVAE(6)
    params, state = model.init(jax.random.key(0))
    # joint + image-only + two single-attr terms + one 3-attr subset term
    masks = np.zeros((5, 19), np.float32)
    masks[0] = 1.0
    masks[1, 0] = 1.0
    masks[2, 3] = 1.0
    masks[3, 11] = 1.0
    masks[4, [2, 5, 9]] = 1.0
    lambdas = np.ones_like(masks)
    lambdas[:, 1:] = 10.0
    batch = _batch()

    # the k=1 terms share one gather group; the k=3 term gets its own
    assert model.decode_group_key(tuple(masks[2])) == 1
    assert model.decode_group_key(tuple(masks[4])) == 3
    assert model.decode_group_key(tuple(masks[0])) is None
    np.testing.assert_array_equal(
        np.asarray(model.decode_term_operands(masks[[4]])), [[1, 4, 8]])

    def loss(p, sup):
        total, aux, st = multi_term_elbo(
            model, p, state, batch, jnp.asarray(masks), jnp.asarray(lambdas),
            jax.random.key(5), 0.7, train=True, recon_support=sup)
        return total, (aux["per_term"], st)

    # full decode: support=None forces the ungrouped all-experts path
    (l0, (pt0, st0)), g0 = jax.value_and_grad(
        loss, has_aux=True)(params, None)
    (l1, (pt1, st1)), g1 = jax.value_and_grad(
        loss, has_aux=True)(params, masks)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pt0), np.asarray(pt1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-4)


@pytest.mark.slow
def test_fast_skip_decode_same_loss_and_grads():
    """--fast-term-decode skips the image decode for attr-only terms: the
    loss, per-term ELBOs, and gradients are exactly unchanged (the skipped
    recon has weight zero); only the image decoder's BN running stats
    diverge (documented) — they stop seeing the skipped terms' moments."""
    from mvae_tpu.core.subsets import celeba19_recon_support

    model = Celeba19MVAE(6)
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(4)
    masks, lambdas = celeba19_step_terms(rng, 1, N_ATTRS, 1.0, 10.0)
    masks, lambdas = jnp.asarray(masks), jnp.asarray(lambdas)
    support = celeba19_recon_support(1, N_ATTRS)
    batch = _batch()

    def loss(p, fast):
        total, aux, st = multi_term_elbo(
            model, p, state, batch, masks, lambdas, jax.random.key(9),
            0.5, train=True, recon_support=support, fast_skip_decode=fast)
        return total, (aux["per_term"], st)

    (l0, (pt0, st0)), g0 = jax.value_and_grad(
        functools.partial(loss, fast=False), has_aux=True)(params)
    (l1, (pt1, st1)), g1 = jax.value_and_grad(
        functools.partial(loss, fast=True), has_aux=True)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pt0), np.asarray(pt1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-4)
    # attr-decoder state subtrees identical; image BN stats diverge (they
    # saw 3 instead of 21 term moments)
    img0 = np.concatenate([np.asarray(s["mean"])
                           for s in st0["dec"]["image"] if s])
    img1 = np.concatenate([np.asarray(s["mean"])
                           for s in st1["dec"]["image"] if s])
    assert not np.allclose(img0, img1)


@pytest.mark.slow
def test_celeba19_full_step_21_terms():
    model = Celeba19MVAE(8)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-4)
    rng = np.random.default_rng(2)
    masks, lambdas = celeba19_step_terms(rng, 1, N_ATTRS, 1.0, 10.0)
    step = make_train_step(model, tx, None, None, dynamic_masks=True)
    p, s, o, r, loss, per_term = step(
        params, state, tx.init(params), jax.random.key(3), _batch(), 0.5,
        jnp.asarray(masks), jnp.asarray(lambdas))
    assert per_term.shape == (21,)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_celeba19_masked_term_ignores_masked_losses():
    """An attr-only term's loss must not change when the image changes."""
    model = Celeba19MVAE(8)
    params, state = model.init(jax.random.key(0))
    masks = np.zeros((1, 19), np.float32)
    masks[0, 3] = masks[0, 5] = 1.0          # attrs 2 and 4 only
    lambdas = np.ones_like(masks)
    b1, b2 = _batch(seed=3), _batch(seed=3)
    b2["image"] = b2["image"] + 0.123        # perturb the masked-out modality
    out1, _, _ = multi_term_elbo(model, params, state, b1,
                                 jnp.asarray(masks), jnp.asarray(lambdas),
                                 None, 1.0, train=False)
    out2, _, _ = multi_term_elbo(model, params, state, b2,
                                 jnp.asarray(masks), jnp.asarray(lambdas),
                                 None, 1.0, train=False)
    np.testing.assert_allclose(float(out1), float(out2), rtol=1e-6)
