"""MVAE_STACK_MODALITIES=1 (vision): the group-stacked vmapped encode/decode
must be semantically identical to the per-modality loop — values, BN state
commits, and gradients — since it is a pure launch-count optimization
(6 conv stacks -> 2 per encode / per decode term)."""


import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # opt-in stacked-vision experiment suite

from mvae_tpu.models.vision import VisionMVAE, MODALITIES, CHANNELS
from mvae_tpu.train.loop import make_train_step

MASKS = np.concatenate([np.ones((1, 6), np.float32),
                        np.eye(6, dtype=np.float32)])
LAMBDAS = np.full((7, 6), 1.0 / 6.0, np.float32)


def _batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    return {m: jnp.asarray(rng.random((b, 64, 64, CHANNELS[m]), np.float32))
            for m in MODALITIES}


@pytest.fixture
def stacked_env(monkeypatch):
    # monkeypatch scopes the mutation: the prior value (or absence) is
    # restored after each test, so an exported MVAE_STACK_MODALITIES=1
    # still governs the rest of the suite
    monkeypatch.setenv("MVAE_STACK_MODALITIES", "1")
    yield monkeypatch


def _trees_close(a, b, rtol, atol, what):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb, what
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=rtol, atol=atol, err_msg=what)


def test_stacked_encode_decode_match_loop(stacked_env):
    model = VisionMVAE(8)
    params, state = model.init(jax.random.key(0))
    batch = _batch(seed=1)

    stacked_env.setenv("MVAE_STACK_MODALITIES", "0")
    mu0, lv0, st0 = model.encode(params, state, batch, jax.random.key(1),
                                 True)
    rec0, dst0 = model.decode(params, state, jnp.ones((2, 8)) * 0.1, None,
                              True)
    stacked_env.setenv("MVAE_STACK_MODALITIES", "1")
    mu1, lv1, st1 = model.encode(params, state, batch, jax.random.key(1),
                                 True)
    rec1, dst1 = model.decode(params, state, jnp.ones((2, 8)) * 0.1, None,
                              True)

    # same dropout keys by construction (fold_in by MODALITIES index)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv0),
                               rtol=1e-5, atol=1e-5)
    _trees_close(st1, st0, 1e-5, 1e-6, "encoder BN state")
    for m in MODALITIES:
        np.testing.assert_allclose(np.asarray(rec1[m]), np.asarray(rec0[m]),
                                   rtol=1e-4, atol=1e-5, err_msg=m)
    _trees_close(dst1, dst0, 1e-5, 1e-6, "decoder BN state")


def test_stacked_full_step_matches_loop(stacked_env):
    """One real optimizer step (7 terms, train mode): loss, grads-as-applied
    (via updated params), and committed BN state agree with the loop path."""
    model = VisionMVAE(8)
    params, state = model.init(jax.random.key(3))
    batch = _batch(b=4, seed=2)
    tx = optax.adam(1e-3)

    outs = {}
    for flag in ("0", "1"):
        stacked_env.setenv("MVAE_STACK_MODALITIES", flag)
        step = make_train_step(model, tx, MASKS, LAMBDAS)
        # the step donates params/state/opt_state — hand it fresh copies
        p_in, s_in = (jax.tree.map(jnp.copy, t) for t in (params, state))
        p, s, o, _, loss, per_term = step(p_in, s_in, tx.init(p_in),
                                          jax.random.key(5), batch, 0.5)
        outs[flag] = (p, s, float(loss), np.asarray(per_term))

    assert np.isfinite(outs["1"][2])
    assert abs(outs["1"][2] - outs["0"][2]) <= 1e-3 * abs(outs["0"][2])
    np.testing.assert_allclose(outs["1"][3], outs["0"][3], rtol=1e-4)
    # adam normalizes each grad, so reassociation-level grad noise near
    # zero can swing a single update by up to ~lr; bound atol by 2*lr.
    _trees_close(outs["1"][0], outs["0"][0], 5e-4, 2e-3, "updated params")
    _trees_close(outs["1"][1], outs["0"][1], 1e-4, 1e-5, "committed state")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_stacked_step_under_dp_tp_mesh(stacked_env):
    """The stacked apply jnp.stack's TP-sharded param leaves inside the
    jitted step — GSPMD must reshard and reproduce the single-device
    UNSTACKED loss (3 terms to bound CPU compile time; encode still runs
    all six modalities through the two stacked groups)."""
    from mvae_tpu.parallel.mesh import (
        make_mesh, batch_sharding, replicated, shard_params_tp)

    masks = np.concatenate([np.ones((1, 6), np.float32),
                            np.eye(6, dtype=np.float32)[:2]])
    lambdas = np.full((3, 6), 1.0 / 6.0, np.float32)
    model = VisionMVAE(8)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    batch = _batch(b=8, seed=4)
    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731

    # the flag is read at TRACE time — build a fresh step per flag so the
    # stacked path is traced by construction rather than relying on an
    # input-sharding jit-cache miss to force a retrace
    stacked_env.setenv("MVAE_STACK_MODALITIES", "0")
    step = make_train_step(model, tx, masks, lambdas)
    _, _, _, _, loss_single, pt_s = step(copy(params), copy(state),
                                         copy(opt_state), jax.random.key(9),
                                         batch, 0.4)

    stacked_env.setenv("MVAE_STACK_MODALITIES", "1")
    step = make_train_step(model, tx, masks, lambdas)
    mesh = make_mesh(data=4, model=2)
    params_tp = shard_params_tp(params, mesh)
    state_m, opt_m = jax.device_put((state, opt_state), replicated(mesh))
    batch_m = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items()}
    _, _, _, _, loss_mesh, pt_m = step(params_tp, state_m, opt_m,
                                       jax.random.key(9), batch_m, 0.4)
    np.testing.assert_allclose(float(loss_single), float(loss_mesh),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pt_s), np.asarray(pt_m), rtol=1e-5)
