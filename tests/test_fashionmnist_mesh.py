"""Multi-device coverage for the FashionMNIST family (VERDICT r4 weak #4):
the last family with zero mesh coverage gets the same sharded-vs-single
equivalence protocol as tests/test_multimnist_mesh.py.

FashionMNIST is structurally a celeba subset (bias-free conv enc / deconv
dec, no BN, text-label MLPs — reference fashionmnist/model.py:70-165), so
the risk is low — but "every family named in a mesh test or dryrun" must
include it. Covers dp=4 sharded chunked-scan == single-device, and the
dp=4 x tp=2 all-devices mesh with shard_params_tp placement (its text MLP
stacks are list-form linears, so the Megatron pairing actually shards
here, unlike multimnist).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from mvae_tpu.models.fashionmnist import FashionMnistMVAE
from mvae_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, shard_params_tp)
from mvae_tpu.train.loop import make_multi_train_step, make_multi_eval_step

MASKS = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
LAMBDAS = [[1.0, 10.0]] * 3
D, N_LOC, B, K = 4, 12, 8, 3


def _data(layout_d, seed=7):
    """Synthetic fashionmnist-shaped arrays: uint8 28x28x1 + labels 0-9."""
    rng = np.random.default_rng(seed)
    n = D * N_LOC
    imgs = (rng.random((n, 28, 28, 1)) * 255).astype(np.uint8)
    labels = rng.integers(0, 10, n).astype(np.int32)
    return {
        "image": imgs.reshape((layout_d, -1) + imgs.shape[1:]),
        "text": labels.reshape(layout_d, -1),
    }


def _local_idxs(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, N_LOC, (K, D, B // D)).astype(np.int32)


def _global_idxs(local):
    offsets = (np.arange(D) * N_LOC)[None, :, None]
    return (local + offsets).reshape(local.shape[0], 1, B).astype(np.int32)


def _single_device_run(model, tx, multi, key):
    params, state = model.init(jax.random.key(0))
    opt = tx.init(params)
    data1 = {k: jax.device_put(v) for k, v in _data(1).items()}
    local = _local_idxs(19)
    betas = jnp.linspace(0.2, 1.0, K)
    out = multi(params, state, opt, key, data1,
                jnp.asarray(_global_idxs(local)), betas)
    return out, data1, local, betas


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < D, reason="needs virtual devices")
def test_fashionmnist_sharded_scan_equals_single_device():
    model = FashionMnistMVAE(8)
    tx = optax.adam(1e-3)
    multi = make_multi_train_step(model, tx, MASKS, LAMBDAS)
    key = jax.random.key(31)
    (p1, s1, o1, _, losses1), data1, local, betas = _single_device_run(
        model, tx, multi, key)

    mesh = make_mesh(D)
    params, state = model.init(jax.random.key(0))
    opt = tx.init(params)
    dataD = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in _data(D).items()}
    pr = jax.device_put((params, state, opt), replicated(mesh))
    idxs = jax.device_put(jnp.asarray(local),
                          NamedSharding(mesh, P(None, "data")))
    pD, sD, oD, _, lossesD = multi(*pr, key, dataD, idxs, betas)

    assert len({s.device.id
                for s in dataD["image"].addressable_shards}) == D

    np.testing.assert_allclose(np.asarray(lossesD), np.asarray(losses1),
                               rtol=1e-5)
    # same bound rationale as test_multimnist_mesh.py: psum reduction-order
    # noise through adam's rsqrt can move near-zero-moment coordinates by
    # up to lr per step; the tight signal is the per-step losses
    for a, b in zip(jax.tree_util.tree_leaves(pD),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=K * 1e-3)

    # eval path (no BN in this family; z = mu, replicated eval batches)
    ev = make_multi_eval_step(model, MASKS, LAMBDAS)
    base = np.arange(2 * (B // D)).reshape(2, 1, B // D)
    ev_local = np.broadcast_to(base, (2, D, B // D)).astype(np.int32)
    e1 = ev(p1, s1, data1, jnp.asarray(_global_idxs(ev_local)))
    eD = ev(pD, sD, dataD, jnp.asarray(ev_local))
    np.testing.assert_allclose(np.asarray(eD), np.asarray(e1), rtol=1e-5)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs virtual devices")
def test_fashionmnist_dp_tp_mesh_runs_and_matches():
    """dp=4 x tp=2: fashionmnist's text MLP lists get real Megatron
    column/row sharding from shard_params_tp (512-wide features divide
    msize=2), so this asserts TP-sharded training matches single-device."""
    model = FashionMnistMVAE(8)
    tx = optax.adam(1e-3)
    multi = make_multi_train_step(model, tx, MASKS, LAMBDAS)
    key = jax.random.key(37)
    (p1, s1, o1, _, losses1), _, local, betas = _single_device_run(
        model, tx, multi, key)

    mesh = make_mesh(8, data=D, model=2)
    params, state = model.init(jax.random.key(0))
    opt = tx.init(params)
    dataD = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in _data(D).items()}
    pT = shard_params_tp(params, mesh)
    sT, oT = jax.device_put((state, opt), replicated(mesh))
    idxs = jax.device_put(jnp.asarray(local),
                          NamedSharding(mesh, P(None, "data")))
    pD, sD, oD, _, lossesD = multi(pT, sT, oT, key, dataD, idxs, betas)

    np.testing.assert_allclose(np.asarray(lossesD), np.asarray(losses1),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(pD),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2.5e-4)
