"""Device-resident input pipeline: gather-inside-jit (data, idx) step must
equal the host-fed step on the gathered batch; uint8 decode must equal
f32/255."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from mvae_tpu.data.mnist import synthetic_mnist
from mvae_tpu.models.mnist import MnistMVAE
from mvae_tpu.train.loop import make_train_step, make_eval_step, decode_batch

MASKS = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
LAMBDAS = [[1.0, 10.0]] * 3


def test_decode_batch_uint8():
    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = decode_batch({"image": jnp.asarray(v)})["image"]
    np.testing.assert_allclose(np.asarray(out), v.astype(np.float32) / 255.0)
    f = jnp.ones((2, 3), jnp.float32)
    assert decode_batch({"attrs": f})["attrs"] is f
    b = decode_batch({"image": jnp.asarray(v)}, jnp.bfloat16)["image"]
    assert b.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(b, np.float32),
                               v.astype(np.float32) / 255.0, atol=1 / 255.0)


def test_resolve_decode_dtype_follows_compute(monkeypatch):
    from mvae_tpu.train.loop import resolve_decode_dtype

    class M:
        compute_dtype = None

    monkeypatch.delenv("MVAE_DECODE_BF16", raising=False)
    m = M()
    assert resolve_decode_dtype(m) == jnp.float32       # --f32 path
    m.compute_dtype = jnp.bfloat16
    assert resolve_decode_dtype(m) == jnp.bfloat16      # shipped default
    monkeypatch.setenv("MVAE_DECODE_BF16", "0")
    assert resolve_decode_dtype(m) == jnp.float32       # explicit pin down
    m.compute_dtype = None
    monkeypatch.setenv("MVAE_DECODE_BF16", "1")
    assert resolve_decode_dtype(m) == jnp.bfloat16      # explicit pin up


@pytest.mark.slow
def test_device_data_step_matches_host_step():
    model = MnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    imgs, labels = synthetic_mnist(128, seed=2)
    imgs_u8 = np.round(imgs.reshape(128, 28, 28, 1) * 255).astype(np.uint8)
    data = {"image": jnp.asarray(imgs_u8), "text": jnp.asarray(labels)}
    idx = jnp.asarray(np.arange(40, 72), jnp.int32)
    host_batch = {"image": (jnp.take(data["image"], idx, 0)
                            .astype(jnp.float32) / 255.0).reshape(32, -1),
                  "text": jnp.take(data["text"], idx, 0)}

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    rng = jax.random.key(5)
    step_h = make_train_step(model, tx, MASKS, LAMBDAS)
    step_d = make_train_step(model, tx, MASKS, LAMBDAS, device_data=True)
    opt = tx.init(params)
    ph, _, _, _, lh, _ = step_h(copy(params), copy(state), copy(opt), rng,
                                host_batch, 0.4)
    pd, _, _, _, ld, _ = step_d(copy(params), copy(state), copy(opt), rng,
                                (data, idx), 0.4)
    # image enters as (B,28,28,1) vs (B,784) — model flattens; same values
    np.testing.assert_allclose(float(lh), float(ld), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ph),
                    jax.tree_util.tree_leaves(pd)):
        # fusion differences (gather+divide) perturb a few f32 ulps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    ev_h = make_eval_step(model, MASKS, LAMBDAS)
    ev_d = make_eval_step(model, MASKS, LAMBDAS, device_data=True)
    lh, _ = ev_h(params, state, host_batch)
    ld, _ = ev_d(params, state, (data, idx))
    np.testing.assert_allclose(float(lh), float(ld), rtol=1e-5)
