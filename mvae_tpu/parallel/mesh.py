"""Device-mesh parallelism.

The reference is strictly single-device (SURVEY.md §2.5: no
DataParallel/torch.distributed anywhere; `--cuda` selects one GPU). The
TPU-native scaling story is GSPMD: pick a Mesh, annotate shardings, let XLA
insert the collectives over ICI.

Axes:
  * "data"  — batch sharding (primary; gradients psum'd by XLA).
  * "model" — tensor parallelism for the 512-wide FC stacks: weights sharded
    on the output feature axis for the first linear of a block and the input
    feature axis of the next (Megatron-style pairing), activations
    re-gathered by XLA where needed. The models here are small, so TP is a
    demonstration axis more than a necessity — documented as such.
  * Expert parallelism for celeba19's 18 stacked attribute experts: the
    leading expert axis of the stacked parameter pytrees shards over "model".

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

import re

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

def _spec_for(path: str, leaf) -> P:
    """Heuristic TP placement for this framework's parameter naming.

    * stacked expert params  (celeba19: leading axis == n_experts)  -> P("model", ...)
    * hidden 512x512 matmuls: alternate column/row sharding by depth  -> handled
      via the simple rule: 2-D weight matrices shard their LARGEST axis over
      "model" when divisible; biases replicate.
    """
    shape = getattr(leaf, "shape", ())
    if "experts" in path and len(shape) >= 1:
        return P("model")
    if len(shape) == 2:
        ax = int(np.argmax(shape))
        if shape[ax] % 2 == 0:
            spec = [None, None]
            spec[ax] = "model"
            return P(*spec)
    return P()


def shard_params_tp(params, mesh):
    """Place a parameter pytree with the TP heuristic over `mesh`."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, leaf in flat:
        pstr = "/".join(re.sub(r"[^a-zA-Z0-9_]", "", str(k)) for k in path)
        spec = _spec_for(pstr, leaf)
        try:
            leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
        except ValueError:
            leaves.append(jax.device_put(leaf, NamedSharding(mesh, P())))
    return jax.tree_util.tree_unflatten(treedef, leaves)
