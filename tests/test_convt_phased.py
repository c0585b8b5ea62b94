"""Phase-decomposed transposed conv (MVAE_CONVT_PHASED) == dilated lowering.

The phased form rewrites ConvTranspose2d(k, s, p) as s*s stride-1
convolutions with the strided sub-kernels w[e::s] interleaved by
depth-to-space (nn/conv.py:_conv_transpose2d_phased). It is the same
math with the base-dilation zeros never multiplied; forward AND gradients
must match the lax.conv_transpose lowering to float-reassociation
tolerance at every production (k, s, p) from SURVEY.md §2.2.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # opt-in phased-deconv experiment suite

from mvae_tpu.nn import conv

# (k, s, p, H, c_in, c_out): every transposed-conv shape family the six
# experiments instantiate, plus ragged (k % s != 0) and exotic cases.
CASES = [
    (4, 2, 1, 8, 12, 6),    # celeba/vision/fashionmnist DCGAN-T stride-2
    (4, 2, 0, 2, 16, 8),    # multimnist convT 256->128 (4,2,0)
    (5, 2, 1, 6, 8, 4),     # multimnist's odd 5-kernel (ragged phases)
    (3, 2, 1, 7, 4, 4),
    (4, 3, 1, 5, 4, 4),
    (2, 2, 0, 9, 4, 4),
    (6, 2, 2, 5, 4, 4),
    (5, 3, 2, 5, 4, 4),
]


def _run(w, x, b, s, p):
    return conv.conv_transpose2d({"w": w, "b": b}, x, stride=s, padding=p)


@pytest.mark.parametrize("k,s,p,H,ci,co", CASES)
def test_phased_matches_dilated_forward_and_grads(k, s, p, H, ci, co,
                                                  monkeypatch):
    rng = np.random.default_rng(k * 100 + s * 10 + p)
    x = jnp.asarray(rng.standard_normal((3, H, H + 1, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, co, ci)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)

    def loss(w_, x_):
        y = _run(w_, x_, b, s, p)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    monkeypatch.delenv("MVAE_CONVT_PHASED", raising=False)
    ref = _run(w, x, b, s, p)
    gw_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(w, x)

    monkeypatch.setenv("MVAE_CONVT_PHASED", "1")
    assert conv._conv_transpose2d_phased(w, x, stride=s, padding=p) is not None
    got = _run(w, x, b, s, p)
    gw, gx = jax.grad(loss, argnums=(0, 1))(w, x)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gw, gw_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gx, gx_ref, rtol=1e-4, atol=1e-4)


def test_phased_full_model_step_matches(monkeypatch):
    """One celeba forward (decoder = 3 stride-2 convT layers) under the flag
    equals the dilated default, params/state/posteriors and all."""
    from mvae_tpu.models.celeba import CelebaMVAE

    model = CelebaMVAE(16)
    params, state = model.init(jax.random.PRNGKey(0))
    z = jnp.asarray(np.random.default_rng(1).standard_normal((4, 16)),
                    jnp.float32)

    def fwd():
        recons, _ = model.decode(params, state, z, None, True)
        return recons

    monkeypatch.delenv("MVAE_CONVT_PHASED", raising=False)
    ref = fwd()
    monkeypatch.setenv("MVAE_CONVT_PHASED", "1")
    got = fwd()
    for m in ref:
        np.testing.assert_allclose(got[m], ref[m], rtol=1e-5, atol=1e-5)
