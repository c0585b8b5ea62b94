"""Multi-chip device-resident pipeline: the sharded chunked-scan step must
equal the single-device chunked-scan step.

The dataset lives on-chip reshaped to (D, n_loc, ...) and sharded
NamedSharding(P("data")); per-step indices are per-shard LOCAL rows, so the
gather never crosses chips (loop.gather_local) and XLA's only collectives
are the gradient psums. Equality holds exactly because the global batch of
step t is the same examples in the same order in both runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from mvae_tpu.data.mnist import synthetic_mnist
from mvae_tpu.models.mnist import MnistMVAE
from mvae_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from mvae_tpu.train.loop import make_multi_train_step, make_multi_eval_step

MASKS = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
LAMBDAS = [[1.0, 10.0]] * 3
D, N_LOC, B, K = 4, 24, 8, 3     # 4 shards, b = 2 local rows per step


def _data(layout_d):
    imgs, labels = synthetic_mnist(D * N_LOC, seed=3)
    u8 = np.round(imgs.reshape(-1, 28, 28, 1) * 255).astype(np.uint8)
    return {
        "image": u8.reshape((layout_d, -1) + u8.shape[1:]),
        "text": labels.reshape(layout_d, -1),
    }


def _local_idxs(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, N_LOC, (K, D, B // D)).astype(np.int32)


def _global_idxs(local):
    """Single-device (K, 1, B) indices selecting the SAME examples in the
    same order as the sharded gather's (D, b) -> (B,) reshape."""
    offsets = (np.arange(D) * N_LOC)[None, :, None]
    return (local + offsets).reshape(local.shape[0], 1, B).astype(np.int32)


@pytest.mark.skipif(len(jax.devices()) < D, reason="needs virtual devices")
@pytest.mark.slow
def test_sharded_multi_step_equals_single_device():
    mesh = make_mesh(D)
    model = MnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    multi = make_multi_train_step(model, tx, MASKS, LAMBDAS)

    local = _local_idxs(11)
    betas = jnp.linspace(0.2, 1.0, K)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731

    # single-device reference: (1, N, ...) layout, global indices
    data1 = {k: jax.device_put(v) for k, v in _data(1).items()}
    p1, s1, o1, _, losses1 = multi(
        copy(params), copy(state), copy(opt), jax.random.key(7), data1,
        jnp.asarray(_global_idxs(local)), betas)

    # sharded: (D, n_loc, ...) over the "data" axis, local indices
    shd = batch_sharding(mesh)
    dataD = {k: jax.device_put(v, shd) for k, v in _data(D).items()}
    pr = jax.device_put((params, state, opt), replicated(mesh))
    idxs = jax.device_put(jnp.asarray(local),
                          NamedSharding(mesh, P(None, "data")))
    pD, sD, oD, _, lossesD = multi(
        *(copy(t) for t in pr), jax.random.key(7), dataD, idxs, betas)

    # every resident shard must actually live on its own device
    img_shards = {s.device.id for s in dataD["image"].addressable_shards}
    assert len(img_shards) == D

    np.testing.assert_allclose(np.asarray(lossesD), np.asarray(losses1),
                               rtol=1e-5)
    # psum reduction order differs from the single-device sum; adam's
    # sqrt-normalization amplifies the f32 noise to ~1e-5 after 3 steps
    for a, b in zip(jax.tree_util.tree_leaves(pD),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)

    # eval path: sequential per-shard windows
    ev = make_multi_eval_step(model, MASKS, LAMBDAS)
    base = np.arange(2 * (B // D)).reshape(2, 1, B // D)
    ev_local = np.broadcast_to(base, (2, D, B // D)).astype(np.int32)
    e1 = ev(p1, s1, data1, jnp.asarray(_global_idxs(ev_local)))
    eD = ev(pD, sD, dataD, jnp.asarray(ev_local))
    np.testing.assert_allclose(np.asarray(eD), np.asarray(e1), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs virtual devices")
@pytest.mark.slow
def test_dp4_tp2_equals_single_device():
    """The round-3 mesh policy's dp x tp decomposition (batch not divisible
    by the device count -> leftover factor shards parameters over "model")
    must train identically to single-device on the same examples."""
    from mvae_tpu.parallel.mesh import shard_params_tp
    mesh = make_mesh(8, data=D, model=2)    # D=4 data shards, tp=2
    model = MnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    multi = make_multi_train_step(model, tx, MASKS, LAMBDAS)

    local = _local_idxs(13)
    betas = jnp.linspace(0.2, 1.0, K)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731

    data1 = {k: jax.device_put(v) for k, v in _data(1).items()}
    p1, s1, o1, _, losses1 = multi(
        copy(params), copy(state), copy(opt), jax.random.key(9), data1,
        jnp.asarray(_global_idxs(local)), betas)

    dataD = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in _data(D).items()}
    pT = shard_params_tp(params, mesh)
    sT = jax.device_put(state, replicated(mesh))
    oT = jax.tree_util.tree_map(
        lambda v: jax.device_put(v, replicated(mesh)), opt)
    idxs = jax.device_put(jnp.asarray(local),
                          NamedSharding(mesh, P(None, "data")))
    pD, sD, oD, _, lossesD = multi(pT, sT, oT, jax.random.key(9), dataD,
                                   idxs, betas)

    # params actually sharded over the model axis (512-wide FC matrices)
    tp_sharded = [a for a in jax.tree_util.tree_leaves(pT)
                  if "model" in str(getattr(a.sharding, "spec", ""))]
    assert tp_sharded, "TP heuristic sharded nothing"
    np.testing.assert_allclose(np.asarray(lossesD), np.asarray(losses1),
                               rtol=1e-5)
    # TP adds a second collective-reduction reorder on top of the psums;
    # adam's rsqrt amplifies the f32 noise to ~1e-4 after 3 steps
    for a, b in zip(jax.tree_util.tree_leaves(pD),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2.5e-4)
