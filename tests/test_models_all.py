"""Model-shape + one-train-step tests for every experiment family
(SURVEY.md §4.2), against the architecture tables in SURVEY.md §2.2."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mvae_tpu.train.loop import make_train_step, make_eval_step

MASKS2 = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
LAMBDAS2 = [[1.0, 10.0]] * 3


def _models(mark_heavy=False):
    """mark_heavy=True tags the conv families `slow` for the fast lane
    (the mnist MLP case stays as the fast-lane full-step representative;
    the conv cases each compile a 3-term train step, 7-36 s on this host)."""
    from mvae_tpu.models.mnist import MnistMVAE
    from mvae_tpu.models.fashionmnist import FashionMnistMVAE
    from mvae_tpu.models.multimnist import MultiMnistMVAE
    from mvae_tpu.models.celeba import CelebaMVAE
    rows = [
        ("mnist", MnistMVAE(16),
         {"image": ((784,), jnp.float32), "text": ((), jnp.int32)}),
        ("fashionmnist", FashionMnistMVAE(16),
         {"image": ((28, 28, 1), jnp.float32), "text": ((), jnp.int32)}),
        ("multimnist", MultiMnistMVAE(16),
         {"image": ((50, 50, 1), jnp.float32), "text": ((4,), jnp.int32)}),
        ("celeba", CelebaMVAE(16),
         {"image": ((64, 64, 3), jnp.float32), "attrs": ((18,), jnp.float32)}),
    ]
    if not mark_heavy:
        return rows
    return [r if r[0] == "mnist"
            else pytest.param(*r, marks=pytest.mark.slow) for r in rows]


def _batch(spec, b=4, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for name, (shape, dtype) in spec.items():
        if dtype == jnp.int32:
            hi = 10 if shape == () else 12
            out[name] = jnp.asarray(
                rng.integers(0, hi, size=(b,) + shape).astype(np.int32))
        else:
            out[name] = jnp.asarray(
                rng.random((b,) + shape).astype(np.float32))
    return out


@pytest.mark.parametrize("name,model,spec", _models(mark_heavy=True),
                         ids=lambda x: x if isinstance(x, str) else "")
def test_shapes_and_one_step(name, model, spec):
    B, L = 4, model.n_latents
    params, state = model.init(jax.random.key(0))
    batch = _batch(spec, B)

    mu, logvar, _ = model.encode(params, state, batch,
                                 jax.random.key(1), True)
    assert mu.shape == (2, B, L), (name, mu.shape)
    assert logvar.shape == (2, B, L)

    recons, _ = model.decode(params, state, jnp.zeros((B, L)),
                             jax.random.key(2), True)
    for mod in model.modalities:
        assert recons[mod].shape[0] == B, (name, mod, recons[mod].shape)
        # per-sample recon loss reduces to (B,)
        loss = model.recon_loss(mod, recons[mod], batch[mod])
        assert loss.shape == (B,), (name, mod, loss.shape)

    tx = optax.adam(1e-3)
    step = make_train_step(model, tx, MASKS2, LAMBDAS2)
    p, s, o, r, loss, per_term = step(params, state, tx.init(params),
                                      jax.random.key(3), batch, 0.5)
    assert np.isfinite(float(loss)), (name, float(loss))
    assert per_term.shape == (3,)


@pytest.mark.slow
def test_bf16_logits_default_is_bit_identical(monkeypatch):
    """Round-3 default: TRAIN-mode decoder logits stay in the compute
    dtype (nn/dcgan.py:_bf16_logits) instead of materializing f32. This
    must be semantics-FREE, not merely close: the loss side upcasts to f32
    before any arithmetic (core/losses.py:bce_row_sum) and the astype VJP
    rounds the cotangent to bf16 at the same point in both forms, so loss
    and every updated-parameter leaf are required to be BIT-identical
    with MVAE_BF16_LOGITS=0 (old f32 materialization) vs =1 (default)."""
    from mvae_tpu.models.celeba import CelebaMVAE
    spec = {"image": ((64, 64, 3), jnp.float32),
            "attrs": ((18,), jnp.float32)}
    batch = _batch(spec, 4)
    tx = optax.adam(1e-3)
    out = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("MVAE_BF16_LOGITS", flag)
        # fresh model + step per flag: the env var is read at TRACE time
        model = CelebaMVAE(16, compute_dtype=jnp.bfloat16)
        params, state = model.init(jax.random.key(0))
        step = make_train_step(model, tx, MASKS2, LAMBDAS2)
        p, s, o, r, loss, per_term = step(params, state, tx.init(params),
                                          jax.random.key(3), batch, 0.5)
        out[flag] = (float(loss), jax.device_get(p))
    assert out["0"][0] == out["1"][0]
    leaves0 = jax.tree.leaves(out["0"][1])
    leaves1 = jax.tree.leaves(out["1"][1])
    assert all(np.array_equal(a, b) for a, b in zip(leaves0, leaves1))


@pytest.mark.parametrize("name,model,spec",
                         _models(), ids=lambda x: x if isinstance(x, str) else "")
def test_eval_deterministic(name, model, spec):
    params, state = model.init(jax.random.key(0))
    batch = _batch(spec, 4, seed=1)
    ev = make_eval_step(model, MASKS2, LAMBDAS2)
    a, _ = ev(params, state, batch)
    b, _ = ev(params, state, batch)
    assert float(a) == float(b), name


def test_multimnist_decoder_output_shape_and_feedback():
    from mvae_tpu.models.multimnist import MultiMnistMVAE
    from mvae_tpu.data.text import N_CHARACTERS, MAX_LENGTH
    model = MultiMnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (3, 8))
    recons, _ = model.decode(params, state, z, None, False)
    assert recons["text"].shape == (3, MAX_LENGTH, N_CHARACTERS)
    # eval decode is deterministic in z
    recons2, _ = model.decode(params, state, z, None, False)
    np.testing.assert_array_equal(np.asarray(recons["text"]),
                                  np.asarray(recons2["text"]))


def test_tokenizer_roundtrip():
    from mvae_tpu.data.text import (
        encode_string, decode_tokens, FILL, SOS, MAX_LENGTH)
    for s in ["", "7", "123", "4059"]:
        toks = encode_string(s)
        assert toks.shape == (MAX_LENGTH,)
        assert decode_tokens(toks) == s
        assert all(t == FILL for t in toks[len(s):])
    assert decode_tokens([SOS, FILL, 1, 2]) == "^12"


@pytest.mark.slow
def test_multimnist_generator_deterministic_and_valid():
    import tempfile
    from mvae_tpu.data.multimnist import load_multimnist
    from mvae_tpu.data.text import FILL
    with tempfile.TemporaryDirectory() as d:
        ds = load_multimnist(d, train=True, generate_n=50)
        assert ds.arrays["image"].shape == (50, 50, 50, 1)
        assert ds.arrays["image"].max() <= 1.0
        assert ds.arrays["text"].shape == (50, 4)
        # 0-digit examples exist (min_digits=0) => all-FILL rows allowed
        assert set(np.unique(ds.arrays["text"])) <= set(range(12))
        ds2 = load_multimnist(d, train=True)  # cached reload identical
        np.testing.assert_array_equal(ds.arrays["image"], ds2.arrays["image"])
