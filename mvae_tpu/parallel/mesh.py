"""Device-mesh parallelism.

The reference is strictly single-device (SURVEY.md §2.5: no
DataParallel/torch.distributed anywhere; `--cuda` selects one GPU). The
TPU-native scaling story is GSPMD: pick a Mesh, annotate shardings, let XLA
insert the collectives over ICI.

Axes:
  * "data"  — batch sharding (primary; gradients psum'd by XLA).
  * "model" — tensor parallelism for the MLP stacks (shard_params_tp):
    consecutive linear layers of an MLP list get Megatron-style pairing —
    layer k column-sharded (output features over "model", bias sharded),
    layer k+1 row-sharded (input features over "model", bias replicated) —
    so the activation between them never leaves the shard and XLA inserts
    exactly ONE all-reduce per pair (asserted on the virtual mesh in
    tests/test_tp_megatron.py). Layers whose relevant feature axis is not
    divisible by mesh.shape["model"] replicate and restart the pairing.
    Standalone weights outside MLP lists (embedding tables, conv kernels,
    BN scales) replicate. The models here are small, so TP is a
    demonstration axis more than a necessity — documented as such.
  * Expert parallelism for celeba19's 18 stacked attribute experts: the
    leading expert axis of the stacked parameter pytrees shards over
    "model" when divisible by the axis size.

Everything is plain `jax.jit` + NamedSharding: semantics are identical to
single-device execution (tested on the 8-virtual-device CPU mesh).

Deliberately absent at this model scale (all families < 25M params):
optimizer-state sharding (ZeRO-style reduce_scatter/all_gather rounds) and
activation rematerialization (`jax.checkpoint`) — full replication of
params+adam state is < 300 MB against 16 GB HBM/chip, so sharding them
would add collective latency for no memory relief. TP params already
shard where the mesh has a "model" axis (shard_params_tp), and adam's
moments inherit those shardings (train/driver.py).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, *, data=None, model=1, devices=None):
    """Build a ("data", "model") mesh. Default: all devices on "data"."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh):
    """Shard the leading batch axis over "data", replicate over "model"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch_dp(batch: dict, mesh):
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


# -- tensor/expert parallel parameter placement ----------------------------

def _is_linear(layer) -> bool:
    """An nn.layers.linear parameter dict: {"w": 2-D [, "b": 1-D]}."""
    return (isinstance(layer, dict) and "w" in layer
            and getattr(layer["w"], "ndim", 0) == 2
            and set(layer) <= {"w", "b"})


def mlp_specs_megatron(layers, msize: int):
    """Megatron-style pairing for a list of consecutive linear layers.

    Returns one {"w": P, "b": P} per layer: layer k column-parallel
    (P(None, "model"), bias P("model")) and layer k+1 row-parallel
    (P("model", None), bias P() — applied after the psum), alternating down
    the stack. The swish between a pair is elementwise, so the intermediate
    activation stays feature-sharded and GSPMD inserts exactly one
    all-reduce per pair (after the row layer). A layer whose paired feature
    axis is not divisible by `msize` replicates and RESTARTS the pairing at
    "column" — partial sharding of a ragged axis would force gather/scatter
    traffic worth more than the matmul.
    """
    specs, col = [], True
    for layer in layers:
        out_ax, in_ax = layer["w"].shape[1], layer["w"].shape[0]
        if col and out_ax % msize == 0:
            specs.append({"w": P(None, "model"), "b": P("model")})
            col = False
        elif not col and in_ax % msize == 0:
            specs.append({"w": P("model", None), "b": P()})
            col = True
        else:
            specs.append({"w": P(), "b": P()})
            col = True
        specs[-1] = {k: v for k, v in specs[-1].items() if k in layer}
    return specs


def tp_spec_tree(params, msize: int, path: str = ""):
    """The full TP placement (a pytree of PartitionSpec mirroring `params`).

    * lists/tuples of linear layers (nn.layers.mlp_init stacks) ->
      Megatron column/row pairing (mlp_specs_megatron);
    * DCGAN posterior heads (nn/dcgan.py:head_init's {"fc", "out"} pair —
      the flattened-conv fc is the largest matmul in the repo, celeba's
      6400x512) -> the same column/row pairing: fc column-parallel, out
      row-parallel, so the 512-wide hidden never leaves the shard and the
      2L-wide posterior replicates after ONE all-reduce;
    * stacked expert params (path contains "experts", celeba19's 18
      attribute nets) -> leading expert axis over "model" when divisible;
    * everything else (conv kernels, embedding tables, BN params, lone
      linears) -> replicated. The decoder-side counterpart ("up",
      L->6400) stays replicated BY CHOICE: it is a lone linear feeding
      the replicated deconv stack, so column-sharding it buys 1/msize of
      a small matmul at the price of all-gathering the 6400-wide
      activation — strictly worse than replicated compute at these sizes.
    """
    if isinstance(params, (list, tuple)) and len(params) > 0 \
            and all(_is_linear(e) for e in params):
        return type(params)(mlp_specs_megatron(params, msize))
    if (isinstance(params, dict) and set(params) == {"fc", "out"}
            and _is_linear(params["fc"]) and _is_linear(params["out"])):
        fc_spec, out_spec = mlp_specs_megatron(
            [params["fc"], params["out"]], msize)
        return {"fc": fc_spec, "out": out_spec}
    if isinstance(params, dict):
        return {k: tp_spec_tree(v, msize, f"{path}/{k}")
                for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(tp_spec_tree(v, msize, f"{path}[{i}]")
                            for i, v in enumerate(params))
    shape = getattr(params, "shape", ())
    if "experts" in path and len(shape) >= 1 and shape[0] % msize == 0:
        return P("model")
    return P()


def shard_params_tp(params, mesh):
    """Place a parameter pytree over `mesh` per tp_spec_tree."""
    specs = tp_spec_tree(params, mesh.shape["model"])
    return jax.tree_util.tree_map(
        lambda spec, leaf: jax.device_put(leaf, NamedSharding(mesh, spec)),
        specs, params, is_leaf=lambda s: isinstance(s, P))
