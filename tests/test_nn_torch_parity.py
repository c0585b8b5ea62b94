"""Golden-value parity of NN primitives vs PyTorch (SURVEY.md §4.3):
fixed weights + fixed inputs -> identical outputs within tolerance."""

import jax.numpy as jnp
import numpy as np
import torch

from mvae_tpu.nn.conv import conv2d, conv_transpose2d
from mvae_tpu.nn.norm import batchnorm_init, batchnorm_apply
from mvae_tpu.nn.rnn import gru_layer, bigru_last_step

torch.manual_seed(0)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    for (cin, cout, k, s, p, hw) in [(1, 64, 4, 2, 1, 28), (64, 128, 4, 2, 1, 14),
                                     (128, 256, 4, 1, 0, 8)]:
        x = rng.normal(size=(2, hw, hw, cin)).astype(np.float32)
        tconv = torch.nn.Conv2d(cin, cout, k, s, p, bias=False)
        w_oihw = tconv.weight.detach().numpy()
        w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
        ours = np.asarray(conv2d({"w": jnp.asarray(w_hwio)},
                                 jnp.asarray(x), stride=s, padding=p))
        theirs = _to_nhwc(tconv(_nchw(x)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_conv_transpose2d_matches_torch():
    rng = np.random.default_rng(1)
    for (cin, cout, k, s, p, hw) in [(256, 128, 4, 1, 0, 5), (128, 64, 4, 2, 1, 8),
                                     (64, 32, 5, 2, 1, 16), (32, 1, 4, 2, 1, 24)]:
        x = rng.normal(size=(2, hw, hw, cin)).astype(np.float32)
        tconv = torch.nn.ConvTranspose2d(cin, cout, k, s, p, bias=False)
        w_iohw = tconv.weight.detach().numpy()        # (in, out, kh, kw)
        w_hwio = np.transpose(w_iohw, (2, 3, 1, 0))   # (kh, kw, out, in)
        ours = np.asarray(conv_transpose2d({"w": jnp.asarray(w_hwio)},
                                           jnp.asarray(x), stride=s, padding=p))
        theirs = _to_nhwc(tconv(_nchw(x)))
        assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_batchnorm_matches_torch_train_and_eval():
    rng = np.random.default_rng(2)
    c = 16
    x = rng.normal(size=(8, 6, 6, c)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(c)
    params, state = batchnorm_init(c)
    # train step
    tbn.train()
    theirs = _to_nhwc(tbn(_nchw(x)))
    ours, new_state = batchnorm_apply(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)
    # eval uses running stats
    tbn.eval()
    x2 = rng.normal(size=(4, 6, 6, c)).astype(np.float32)
    theirs2 = _to_nhwc(tbn(_nchw(x2)))
    ours2, _ = batchnorm_apply(params, new_state, jnp.asarray(x2), train=False)
    np.testing.assert_allclose(np.asarray(ours2), theirs2, rtol=1e-4, atol=1e-4)


def _gru_params_from_torch(tgru, layer=0, reverse=False):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "w_ih": jnp.asarray(getattr(tgru, f"weight_ih{sfx}").detach().numpy().T),
        "w_hh": jnp.asarray(getattr(tgru, f"weight_hh{sfx}").detach().numpy().T),
        "b_ih": jnp.asarray(getattr(tgru, f"bias_ih{sfx}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(tgru, f"bias_hh{sfx}").detach().numpy()),
    }


def test_gru_layer_matches_torch():
    rng = np.random.default_rng(3)
    T, B, D, H = 4, 3, 20, 16
    x = rng.normal(size=(T, B, D)).astype(np.float32)
    tgru = torch.nn.GRU(D, H, 1)
    p = _gru_params_from_torch(tgru)
    ys, hT = gru_layer(p, jnp.asarray(x), jnp.zeros((B, H)))
    theirs, _ = tgru(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ys), theirs.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_bigru_last_step_matches_torch():
    rng = np.random.default_rng(4)
    T, B, D, H = 4, 3, 20, 16
    x = rng.normal(size=(T, B, D)).astype(np.float32)
    tgru = torch.nn.GRU(D, H, 1, bidirectional=True)
    p_f = _gru_params_from_torch(tgru)
    p_b = _gru_params_from_torch(tgru, reverse=True)
    h_f, h_b = bigru_last_step(p_f, p_b, jnp.asarray(x))
    out, _ = tgru(torch.from_numpy(x))
    last = out[-1].detach().numpy()       # (B, 2H)
    np.testing.assert_allclose(np.asarray(h_f), last[:, :H], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_b), last[:, H:], rtol=1e-4, atol=1e-5)


def test_batchnorm_one_pass_vs_two_pass():
    """The one-pass (E[x^2]-E[x]^2) default and the textbook two-pass form
    agree to f32 rounding on realistic data; on a constant channel the
    clamp keeps var at exactly 0 (matching two-pass and torch)."""
    rng = np.random.default_rng(7)
    c = 32
    x = rng.normal(3.0, 2.0, size=(16, 5, 5, c)).astype(np.float32)
    x[..., 0] = 1.234                        # constant channel
    params, state = batchnorm_init(c)
    y1, s1 = batchnorm_apply(params, state, jnp.asarray(x), train=True,
                             one_pass=True)
    y2, s2 = batchnorm_apply(params, state, jnp.asarray(x), train=True,
                             one_pass=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1["var"]), np.asarray(s2["var"]),
                               rtol=1e-4, atol=1e-5)
    # constant channel: var clamps to ~0, output ~0 (bias), finite always
    assert np.isfinite(np.asarray(y1)).all()
    assert abs(float(s1["var"][0]) - 0.9) < 1e-3   # EMA: 0.9*1.0 + 0.1*~0


def test_batchnorm_mxu_moments_matches_reductions(monkeypatch):
    """MVAE_BN_MXU_MOMENTS=1 (ones-vector matmul moments) agrees with the
    fused one-pass reductions to f32 accumulation-order noise — values,
    committed state, AND grads — and preserves bf16 output dtype."""
    import jax

    import mvae_tpu.nn.norm as norm
    rng = np.random.default_rng(13)
    c = 32
    x = jnp.asarray(rng.normal(1.0, 2.0, (16, 5, 5, c)), jnp.float32)
    params, state = batchnorm_init(c)

    def loss(p, xx):
        y, s = norm.batchnorm_apply(p, state, xx, train=True)
        return jnp.sum(jnp.square(y)) + jnp.sum(s["var"]), s

    (l0, s0), g0 = jax.value_and_grad(loss, argnums=(0, 1),
                                      has_aux=True)(params, x)
    monkeypatch.setenv("MVAE_BN_MXU_MOMENTS", "1")
    assert norm._mxu_moments() is True
    (l1, s1), g1 = jax.value_and_grad(loss, argnums=(0, 1),
                                      has_aux=True)(params, x)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s0[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # scale/bias grads are near-cancelling sums of ~12k O(1) terms, so
    # accumulation order moves them at the ~1e-4 f32 noise floor
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    # bf16 input: output dtype must match the reduction path's exactly
    y_mxu, _ = norm.batchnorm_apply(params, state, x.astype(jnp.bfloat16),
                                    train=True)
    monkeypatch.delenv("MVAE_BN_MXU_MOMENTS")
    y_red, _ = norm.batchnorm_apply(params, state, x.astype(jnp.bfloat16),
                                    train=True)
    assert y_mxu.dtype == y_red.dtype


def test_batchnorm_two_pass_env_switch(monkeypatch):
    """MVAE_BN_TWO_PASS=1 restores the textbook moments as the default
    (read lazily at trace time, no reimport needed), and wins over
    MVAE_PALLAS_BN=1 — the Pallas kernel hard-codes one-pass moments, so
    the escape hatch must route around it."""
    import mvae_tpu.nn.norm as norm
    monkeypatch.setenv("MVAE_BN_TWO_PASS", "1")
    assert norm._one_pass_default() is False
    monkeypatch.setenv("MVAE_PALLAS_BN", "1")
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (8, 4, 4, 32)), jnp.float32)
    params, state = batchnorm_init(32)
    y_both, _ = norm.batchnorm_swish_apply(params, state, x, train=True)
    monkeypatch.delenv("MVAE_PALLAS_BN")
    y_two, _ = norm.batchnorm_swish_apply(params, state, x, train=True)
    np.testing.assert_array_equal(np.asarray(y_both), np.asarray(y_two))
    monkeypatch.delenv("MVAE_BN_TWO_PASS")
    assert norm._one_pass_default() is True
