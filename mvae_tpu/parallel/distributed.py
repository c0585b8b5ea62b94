"""Multi-process (multi-host) bootstrap + per-process data feeding.

The reference is strictly single-device (README.md:47, mnist/train.py:151-154
pick one GPU); multi-host support is the SURVEY §2.5 TPU-native mandate, not
a parity item: "jax.distributed.initialize + mesh collectives ... DCN for
multi-slice", with per-host data feeding.

Design (the scaling-book recipe, nothing exotic):

* `maybe_initialize(args)` — guarded `jax.distributed.initialize`. On a
  real multi-host TPU slice JAX infers coordinator/process_id from the TPU
  runtime and a bare `--distributed` suffices; on CPU/GPU (and in the
  2-process CPU test, tests/test_multiprocess.py) the triple
  `--coordinator host:port --process-id i --n-processes N` (or the
  JAX_COORDINATOR_ADDRESS/JAX_PROCESS_ID/JAX_NUM_PROCESSES env vars) pins
  it explicitly. MUST run before the first backend touch; run_training
  calls it before any jax.devices()/jax.random use.

* `global_batch(sharding, local_rows)` — per-process feeding:
  every process holds ONLY its shard of each batch and assembles the
  global jax.Array via `jax.make_array_from_process_local_data`. The jitted
  step then runs SPMD across all processes with XLA's collectives riding
  ICI (within a slice) / DCN (across slices) — no host ever materializes
  the global batch.

* `process_rows(n)` — which rows of a data-axis-sharded global array this
  process owns. The driver shards batches over the leading "data" mesh
  axis; with the mesh built from `jax.devices()` (process-major device
  order), process p of P owns the contiguous row block
  [p*n/P, (p+1)*n/P) — asserted against the sharding's addressable devices
  rather than assumed.

Multi-process ships DATA-PARALLEL ONLY (train/driver.py raises a clear
SystemExit otherwise). That is a layout decision, not a gap: tensor/
expert-parallel collectives are latency-bound per-layer all-reduces that
belong on ICI inside a host/slice — spanning them across processes puts
them on DCN, the scaling-book anti-pattern. On a multi-host slice the
right decomposition is tp/ep within each host's devices and dp across
hosts; at this model scale (<25M params, replicated in every process)
pure dp across processes is both the simple and the fast layout, and it
keeps checkpoints/eval host-local.
"""

import jax
import numpy as np


def maybe_initialize(args=None):
    """Guarded `jax.distributed.initialize`. Returns (process_index,
    process_count) AFTER initialization — (0, 1) when not distributed.

    Reads, in order: explicit CLI flags (``--coordinator``,
    ``--process-id``, ``--n-processes``, ``--distributed``), then the
    standard JAX env vars. No-ops when neither requests distribution, and
    when jax.distributed is already initialized (idempotent under
    restarts/tests).
    """
    import os

    coord = getattr(args, "coordinator", None) if args is not None else None
    pid = getattr(args, "process_id", None) if args is not None else None
    nproc = getattr(args, "n_processes", None) if args is not None else None
    bare = bool(getattr(args, "distributed", False)) if args is not None \
        else False
    coord = coord or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if pid is None and "JAX_PROCESS_ID" in os.environ:
        pid = int(os.environ["JAX_PROCESS_ID"])
    if nproc is None and "JAX_NUM_PROCESSES" in os.environ:
        nproc = int(os.environ["JAX_NUM_PROCESSES"])

    if not (bare or coord):
        return 0, 1

    kw = {}
    if coord:
        kw["coordinator_address"] = coord
    if nproc is not None:
        kw["num_processes"] = int(nproc)
    if pid is not None:
        kw["process_id"] = int(pid)
    try:
        # on a real TPU slice with bare --distributed, all three are
        # inferred from the TPU runtime metadata
        jax.distributed.initialize(**kw)
    except RuntimeError as e:          # already initialized: idempotent
        if "already" not in str(e).lower():
            raise
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def process_rows(sharding, n_rows: int):
    """(start, stop) row block of a leading-axis-sharded global array that
    THIS process owns under `sharding`. Verifies the driver's contiguity
    assumption (process-major mesh order) instead of assuming it."""
    idx_map = sharding.addressable_devices_indices_map((n_rows,))
    blocks = set()
    for sl in idx_map.values():
        s = sl[0]
        blocks.add((0 if s.start is None else s.start,
                    n_rows if s.stop is None else s.stop))
    lo = min(b[0] for b in blocks)
    hi = max(b[1] for b in blocks)
    covered = sum(b[1] - b[0] for b in blocks)
    # contiguous + equal share (a mesh built from jax.devices() is
    # process-major, so this holds; a custom device order would not)
    assert covered == hi - lo == n_rows // jax.process_count(), (
        f"process rows not an equal contiguous block: blocks={blocks} of "
        f"{n_rows} rows over {jax.process_count()} processes")
    return lo, hi


def global_batch(sharding, local_rows, global_shape=None):
    """Assemble a global, leading-axis-sharded jax.Array from this
    process's rows (`jax.make_array_from_process_local_data`). Single
    process: equivalent to device_put(local_rows, sharding). Pass
    global_shape explicitly (local rows x process count on axis 0) —
    inference is fine for pure data-parallel but ambiguous once the mesh
    has a "model" axis."""
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    if global_shape is None:
        global_shape = (local_rows.shape[0] * jax.process_count(),
                        ) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows), global_shape)


def global_batch_tree(sharding, tree, n_rows):
    """Per-process feeding of a whole batch dict: every process passes the
    FULL global batch (identical across processes — same seed), keeps only
    its `process_rows` block, and assembles the global arrays."""
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in tree.items()}
    lo, hi = process_rows(sharding, n_rows)
    return {k: global_batch(sharding, v[lo:hi], v.shape)
            for k, v in tree.items()}
