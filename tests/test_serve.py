"""Serving endpoints: shapes, determinism, conditioning effect."""

import jax
import numpy as np
import optax
import pytest

from mvae_tpu.data.mnist import synthetic_mnist
from mvae_tpu.models.mnist import MnistMVAE
from mvae_tpu.serve import Sampler
from mvae_tpu.train.loop import make_train_step


@pytest.fixture(scope="module")
def sampler():
    import jax.numpy as jnp
    model = MnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    # a few steps so conditioning has signal
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = make_train_step(model, tx, [[1., 1.], [1., 0.], [0., 1.]],
                           [[1., 10.]] * 3)
    imgs, labels = synthetic_mnist(256, seed=0)
    batch = {"image": jnp.asarray(imgs.reshape(256, 784)),
             "text": jnp.asarray(labels)}
    rng = jax.random.key(1)
    for _ in range(30):
        params, state, opt, rng, _, _ = step(params, state, opt, rng,
                                             batch, 0.05)
    return Sampler(model, params, state)


def test_unconditional_shapes_and_determinism(sampler):
    out = sampler.sample(n=4, seed=7)
    assert out["image"].shape == (4, 784)
    assert out["text"].shape == (4, 10)
    assert float(out["image"].min()) >= 0 and float(out["image"].max()) <= 1
    out2 = sampler.sample(n=4, seed=7)
    np.testing.assert_array_equal(np.asarray(out["image"]),
                                  np.asarray(out2["image"]))


def test_conditional_sampling_uses_condition(sampler):
    import jax.numpy as jnp
    a = sampler.sample(n=4, condition={"text": jnp.asarray([0])}, seed=3)
    b = sampler.sample(n=4, condition={"text": jnp.asarray([7])}, seed=3)
    assert not np.allclose(np.asarray(a["image"]), np.asarray(b["image"]))


def test_batch_bucketing_compiles_once_per_bucket(sampler):
    """Request sizes bucket to the next power of two: sizes 5..8 share one
    compiled graph; padded rows never leak into the sliced outputs."""
    import jax.numpy as jnp
    from mvae_tpu.serve import _bucket
    assert [_bucket(n) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 16]
    full = sampler.sample(n=8, seed=11)
    part = sampler.sample(n=5, seed=11)
    assert part["image"].shape == (5, 784)
    np.testing.assert_array_equal(np.asarray(part["image"]),
                                  np.asarray(full["image"][:5]))
    imgs, _ = synthetic_mnist(8, seed=4)
    mu8, lv8 = sampler.embed({"image": jnp.asarray(imgs.reshape(8, 784))})
    mu5, lv5 = sampler.embed({"image": jnp.asarray(imgs.reshape(8, 784)[:5])})
    assert mu5.shape == (5, 8)
    np.testing.assert_allclose(np.asarray(mu5), np.asarray(mu8[:5]),
                               rtol=1e-6)


def test_reconstruct_roundtrip(sampler):
    import jax.numpy as jnp
    imgs, labels = synthetic_mnist(6, seed=9)
    rec = sampler.reconstruct({"image": jnp.asarray(imgs.reshape(6, 784))})
    assert rec["image"].shape == (6, 784)
    assert rec["text"].shape == (6, 10)
    np.testing.assert_allclose(np.asarray(rec["text"]).sum(-1), 1.0,
                               rtol=1e-4)


@pytest.mark.slow
def test_warmup_precompiles_endpoints(sampler):
    """warmup() traces every endpoint for the requested buckets without
    error; later calls at covered sizes reuse those compiled graphs."""
    sampler.warmup(buckets=(1, 4))
    out = sampler.sample(n=3, seed=2, condition={"text": np.asarray([1])})
    assert out["image"].shape == (3, 784)


@pytest.mark.slow
def test_mesh_sharded_serving_matches_single_device(sampler):
    """Sampler(mesh=...) serves the same values as single-device: params
    replicate, request batches shard P("data"), buckets round up to the
    dp size so every chip holds equal rows; outputs come back sharded."""
    import jax.numpy as jnp
    from mvae_tpu.parallel.mesh import make_mesh, batch_sharding
    mesh = make_mesh(8)
    sharded = Sampler(sampler.model, sampler.params, sampler.state,
                      mesh=mesh)
    assert sharded._bucket_m(3) == 8       # bucket 4 -> dp multiple 8
    assert sharded._bucket_m(11) == 16

    imgs, _ = synthetic_mnist(11, seed=5)
    x = jnp.asarray(imgs.reshape(11, 784))
    mu_s, lv_s = sharded.embed({"image": x})
    mu_1, lv_1 = sampler.embed({"image": x})
    assert mu_s.shape == (11, 8)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_1),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv_s), np.asarray(lv_1),
                               rtol=2e-5, atol=1e-6)

    out_s = sharded.sample(n=5, seed=3)
    out_1 = sampler.sample(n=5, seed=3)
    assert out_s["image"].shape == out_1["image"].shape == (5, 784)
    # prior-sample z draws depend on the bucket size (8 vs dp-rounded 8
    # here), so values match exactly when buckets agree
    np.testing.assert_allclose(np.asarray(out_s["image"]),
                               np.asarray(out_1["image"]),
                               rtol=2e-5, atol=1e-6)

    rec_s = sharded.reconstruct({"image": x})
    rec_1 = sampler.reconstruct({"image": x})
    np.testing.assert_allclose(np.asarray(rec_s["text"]),
                               np.asarray(rec_1["text"]),
                               rtol=2e-5, atol=1e-6)

    # the compiled embed really shards its batch over "data"
    padded = jnp.zeros((16, 784), jnp.float32)
    mu16, _ = sharded._embed(("image",), sharded._place(padded))
    assert mu16.sharding.is_equivalent_to(batch_sharding(mesh), mu16.ndim)


def test_compilation_cache_dir_config(tmp_path):
    """enable_compilation_cache points JAX's persistent cache at the
    requested directory (restart-skip-compile contract)."""
    import jax as j
    from mvae_tpu.serve import enable_compilation_cache
    old = j.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path))
        assert j.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        j.config.update("jax_compilation_cache_dir", old)
