"""Checkpoint -> resume must reproduce the exact same next step
(SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvae_tpu.data.mnist import synthetic_mnist
from mvae_tpu.models.mnist import MnistMVAE
from mvae_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, restore_into)
from mvae_tpu.train.loop import make_train_step

MASKS = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
LAMBDAS = [[1.0, 10.0]] * 3


def test_save_load_resume_bitwise(tmp_path):
    model = MnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, MASKS, LAMBDAS)
    imgs, labels = synthetic_mnist(32, seed=5)
    batch = {"image": jnp.asarray(imgs.reshape(32, 784)),
             "text": jnp.asarray(labels)}
    rng = jax.random.key(42)

    # two steps, checkpoint after the first
    p1, s1, o1, r1, l1, _ = step(params, state, opt_state, rng, batch, 0.5)
    save_checkpoint({"params": p1, "state": s1, "opt_state": o1,
                     "rng": jax.random.key_data(r1)},
                    {"n_latents": 8, "epoch": 1, "best_loss": float(l1)},
                    True, str(tmp_path))
    p2, s2, o2, r2, l2, _ = step(p1, s1, o1, r1, batch, 0.6)

    # restore and retake the second step
    raw, meta = load_checkpoint(str(tmp_path / "checkpoint.msgpack"))
    model_b = MnistMVAE(meta["n_latents"])
    pb, sb = model_b.init(jax.random.key(0))
    ob = tx.init(pb)
    tpl = {"params": pb, "state": sb, "opt_state": ob,
           "rng": jax.random.key_data(jax.random.key(0))}
    got = restore_into(tpl, raw)
    rng_b = jax.random.wrap_key_data(jnp.asarray(got["rng"]))
    p2b, s2b, o2b, _, l2b, _ = step(got["params"], got["state"],
                                    got["opt_state"], rng_b, batch, 0.6)

    assert float(l2) == float(l2b)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p2b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best-file contract
    assert (tmp_path / "model_best.msgpack").exists()
