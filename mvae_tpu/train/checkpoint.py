"""Resumable checkpoints with the reference's dual-file contract.

The reference saves {state_dict, best_loss, n_latents, optimizer} to
`checkpoint.pth.tar` and copies it to `model_best.pth.tar` on test-loss
improvement (mnist/train.py:115-129,256-268) — but cannot actually resume
(load_checkpoint drops the optimizer state; no --resume flag). We keep the
dual-file contract and fix the gap: the checkpoint holds everything needed
for a bitwise resume — params, BN state, optimizer state, epoch, global
step (=annealing position), PRNG key, and self-describing metadata.

Format: msgpack via flax.serialization (host arrays), one file, atomic
rename; best-copy is a same-filesystem copy, matching save_checkpoint's
semantics (mnist/train.py:115-121).
"""

import json
import os
import shutil
import tempfile

import jax
import numpy as np
from flax import serialization

CKPT = "checkpoint.msgpack"
BEST = "model_best.msgpack"


def save_checkpoint(train_state: dict, meta: dict, is_best: bool,
                    folder: str, filename: str = CKPT):
    """train_state: pytree of arrays (params/state/opt_state/rng/...);
    meta: JSON-serializable dict (n_latents, model, epoch, best_loss, ...)."""
    os.makedirs(folder, exist_ok=True)
    # Clean tmp files left by a KILLED process only: an age threshold keeps
    # two live runs sharing an out_dir (the default ./trained_models is
    # shared across experiments) from deleting each other's in-flight
    # mkstemp file mid-save.
    import time
    now = time.time()
    for stale in os.listdir(folder):
        p = os.path.join(folder, stale)
        try:
            if stale.endswith(".tmp") and now - os.path.getmtime(p) > 3600:
                os.unlink(p)
        except OSError:
            pass
    host_state = jax.device_get(train_state)
    payload = {"meta": np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8).copy(),
        "state": serialization.to_state_dict(host_state)}
    data = serialization.msgpack_serialize(payload)
    fd, tmp = tempfile.mkstemp(dir=folder, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(folder, filename))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if is_best:
        shutil.copyfile(os.path.join(folder, filename),
                        os.path.join(folder, BEST))


def load_checkpoint(path: str):
    """Returns (train_state_pytree_of_np_arrays, meta_dict)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(bytes(payload["meta"]).decode("utf-8"))
    return payload["state"], meta


def restore_into(template, restored):
    """Shape a restored raw state-dict into `template`'s structure (e.g.
    optax NamedTuple states)."""
    return serialization.from_state_dict(template, restored)
