"""Megatron-style tensor-parallel placement: spec pinning + collective count.

The TP contract (parallel/mesh.py docstring): consecutive linears of an MLP
list pair up column/row over "model", so GSPMD inserts exactly ONE
all-reduce per pair and never gathers the 512-wide hidden activations.
Reference has no TP at all (SURVEY.md §2.5) — this is the TPU-native
scaling axis for the reference's 512-wide FC stacks (mnist/model.py:87-105).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mvae_tpu.nn.layers import mlp_init, mlp_apply
from mvae_tpu.parallel.mesh import (
    make_mesh, mlp_specs_megatron, shard_params_tp, tp_spec_tree)


def need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


def test_mlp_specs_alternate_col_row():
    params = mlp_init(jax.random.key(0), [784, 512, 512, 512, 784])
    specs = mlp_specs_megatron(params, 8)
    assert [s["w"] for s in specs] == [
        P(None, "model"), P("model", None), P(None, "model"),
        P("model", None)]
    # column layers shard their bias with the outputs; row layers apply
    # theirs after the psum, replicated
    assert [s["b"] for s in specs] == [P("model"), P(), P("model"), P()]


def test_ragged_axis_replicates_and_restarts():
    # 10-wide head: 10 % 8 != 0 -> that layer replicates, pairing restarts
    params = mlp_init(jax.random.key(0), [64, 512, 10, 512, 512])
    specs = mlp_specs_megatron(params, 8)
    assert specs[0]["w"] == P(None, "model")   # col (512 out)
    assert specs[1]["w"] == P("model", None)   # row (512 in)
    assert specs[2]["w"] == P(None, "model")   # col again (512 out)
    assert specs[3]["w"] == P("model", None)   # row (512 in)
    specs = mlp_specs_megatron(params, 3)      # nothing divisible by 3
    assert all(s["w"] == P() and s["b"] == P() for s in specs)


def test_spec_tree_expert_and_fallback_rules():
    tree = {
        "attr_dec_experts": {"w1": np.zeros((16, 100, 512))},
        "conv": [{"w": np.zeros((4, 4, 3, 32)), "b": np.zeros(32)}],
        "embed": {"table": np.zeros((10, 512))},
        "mlp": mlp_init(jax.random.key(0), [64, 512, 512]),
    }
    specs = tp_spec_tree(tree, 8)
    assert specs["attr_dec_experts"]["w1"] == P("model")   # 16 % 8 == 0
    assert specs["conv"][0]["w"] == P()                    # 4-D kernel
    assert specs["embed"]["table"] == P()                  # lone table
    assert specs["mlp"][0]["w"] == P(None, "model")
    assert specs["mlp"][1]["w"] == P("model", None)
    # non-divisible expert axis replicates instead of erroring
    specs = tp_spec_tree({"experts": {"w": np.zeros((18, 8))}}, 4)
    assert specs["experts"]["w"] == P()


def _compiled_text(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def test_pairing_compiles_to_one_allreduce_per_pair():
    need_devices(8)
    mesh = make_mesh(8, model=8)       # pure TP: every collective is TP's
    params = mlp_init(jax.random.key(0), [64, 512, 512, 512, 784])
    sharded = shard_params_tp(params, mesh)
    x = jax.device_put(np.random.default_rng(0).random((16, 64), np.float32),
                       NamedSharding(mesh, P()))

    hlo = _compiled_text(mlp_apply, sharded, x)
    n_ar = len(re.findall(r"\ball-reduce(?:-start)?\(", hlo))
    n_ag = len(re.findall(r"\ball-gather(?:-start)?\(", hlo))
    # 4 layers = 2 column/row pairs -> exactly 2 all-reduces, and the
    # hidden activations never get all-gathered
    assert n_ar == 2, hlo[:2000]
    assert n_ag == 0, hlo[:2000]

    # values match the unsharded apply
    ref = mlp_apply(params, np.asarray(x))
    out = mlp_apply(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_spec_tree_dcgan_head_rule():
    """nn/dcgan.py:head_init's {"fc", "out"} posterior head is a Megatron
    pair: fc column-parallel, out row-parallel (VERDICT r4 item 7 — the
    6400x512 fc is the largest matmul in the repo)."""
    from mvae_tpu.nn.dcgan import head_init

    head = head_init(jax.random.key(0), 256 * 5 * 5, 100)
    specs = tp_spec_tree({"image_enc": {"head": head}}, 8)
    hs = specs["image_enc"]["head"]
    assert hs["fc"] == {"w": P(None, "model"), "b": P("model")}
    assert hs["out"] == {"w": P("model", None), "b": P()}
    # hidden=512 not divisible -> whole pair replicates (restart rule)
    specs = tp_spec_tree({"head": head}, 3)["head"]
    assert specs["fc"]["w"] == P() and specs["out"]["w"] == P()


def test_dcgan_head_compiles_to_one_allreduce():
    need_devices(8)
    from mvae_tpu.nn.dcgan import head_apply, head_init

    mesh = make_mesh(8, model=8)       # pure TP: every collective is TP's
    head = head_init(jax.random.key(0), 256 * 5 * 5, 100)
    sharded = shard_params_tp(head, mesh)
    x = jax.device_put(
        np.random.default_rng(0).random((16, 6400), np.float32),
        NamedSharding(mesh, P()))

    fn = lambda p, x: head_apply(p, x, rng=None, train=False)  # noqa: E731
    hlo = _compiled_text(fn, sharded, x)
    n_ar = len(re.findall(r"\ball-reduce(?:-start)?\(", hlo))
    n_ag = len(re.findall(r"\ball-gather(?:-start)?\(", hlo))
    # one column/row pair -> exactly ONE all-reduce (after the row layer),
    # and the 512-wide hidden never gets all-gathered
    assert n_ar == 1, hlo[:2000]
    assert n_ag == 0, hlo[:2000]

    ref = fn(head, np.asarray(x))
    np.testing.assert_allclose(np.asarray(fn(sharded, x)), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_eval_equivalence_celeba_dcgan_head():
    """Full celeba eval step under dp=4 x tp=2 with the head sharded:
    loss matches single-device (flagship-family TP is no longer
    expert-only — VERDICT r4 weak item 5)."""
    need_devices(8)
    from mvae_tpu.models.celeba import CelebaMVAE
    from mvae_tpu.train.loop import make_eval_step

    model = CelebaMVAE(16)
    params, state = model.init(jax.random.key(0))
    masks = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
    lambdas = [[1.0, 10.0]] * 3
    step = make_eval_step(model, masks, lambdas)
    rng = np.random.default_rng(2)
    batch = {"image": rng.random((8, 64, 64, 3)).astype(np.float32),
             "attrs": (rng.random((8, 18)) < 0.5).astype(np.float32)}
    ref, _ = step(params, state, batch)

    mesh = make_mesh(8, model=2)
    sharded = shard_params_tp(params, mesh)
    st = jax.device_put(state, NamedSharding(mesh, P()))
    b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
         for k, v in batch.items()}
    got, _ = step(sharded, st, b)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)


def test_tp_eval_equivalence_mnist_model():
    need_devices(8)
    from mvae_tpu.models.mnist import MnistMVAE
    from mvae_tpu.train.loop import make_eval_step

    model = MnistMVAE(16)
    params, state = model.init(jax.random.key(0))
    masks = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
    lambdas = [[1.0, 10.0]] * 3
    step = make_eval_step(model, masks, lambdas)
    rng = np.random.default_rng(1)
    batch = {"image": rng.random((32, 784)).astype(np.float32),
             "text": rng.integers(0, 10, (32,)).astype(np.int32)}
    ref, _ = step(params, state, batch)

    mesh = make_mesh(8, model=2)       # dp=4 x tp=2
    sharded = shard_params_tp(params, mesh)
    b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
         for k, v in batch.items()}
    got, _ = step(sharded, state, b)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)
