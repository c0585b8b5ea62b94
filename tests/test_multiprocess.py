"""Multi-process (multi-host) bootstrap: 2 jax.distributed CPU processes.

SURVEY §2.5's comm-backend mandate beyond single-host: the driver must
`jax.distributed.initialize` and feed data PER PROCESS
(`jax.make_array_from_process_local_data`), with XLA collectives crossing
process boundaries. This launches 2 real OS processes (4 virtual CPU
devices each — 8 global, the same count the rest of the suite uses),
trains the real driver end-to-end in both, and asserts:

  1. both processes end with identical (replicated) parameters, and
  2. those parameters match a single-process 8-device run of the same
     configuration to collective-reordering tolerance.

The reference has no analog (strictly single-device, README.md:47)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(__file__)
_WORKER = os.path.join(_HERE, "_mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path)
    env = os.environ.copy()
    # each worker pins its own XLA_FLAGS/JAX_PLATFORMS before importing jax
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen(
        [sys.executable, _WORKER, f"127.0.0.1:{port}", str(i), "2", out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            outs.append(stdout.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-4000:]}"

    # only process 0 logs and checkpoints
    assert "data-parallel over all 8 devices across 2 processes" in outs[0]
    assert "====> Test Loss" in outs[0]
    assert "====> Test Loss" not in outs[1]
    assert os.path.exists(os.path.join(out, "ckpt", "checkpoint.msgpack"))

    got0 = np.load(os.path.join(out, "params_0.npy"))
    got1 = np.load(os.path.join(out, "params_1.npy"))
    # replicated params agree across processes (gloo all-reduce segments
    # are not guaranteed bitwise-identical per replica — last-ulp only)
    np.testing.assert_allclose(got0, got1, rtol=1e-5, atol=1e-7)

    # single-process reference on the same 8 global devices (conftest mesh)
    from _mp_worker import build, flat_params
    from mvae_tpu.train.driver import run_training
    model, train_ds, test_ds, args, masks, lambdas = build(
        os.path.join(out, "ref_ckpt"))
    params, _ = run_training(model, train_ds, test_ds, args, masks,
                             lambdas, out_dir=args.out_dir,
                             meta={"model": "mnist", "n_latents": 8})
    want = flat_params(params)
    assert want.size == got0.size
    # identical GSPMD program on an identical global mesh; the only
    # difference is gloo cross-process segments inside the collectives, so
    # the drift is f32 reduction reordering compounded through 16 adam
    # steps (measured: 3/2.4M elements past rtol 2e-4, max rel 8.9e-4)
    np.testing.assert_allclose(got0, want, rtol=2e-3, atol=2e-5)
