"""Worker process for tests/test_multiprocess.py.

Runs the REAL driver (`run_training`) as one of N jax.distributed CPU
processes: 4 virtual CPU devices per process, global mesh data=4*N, tiny
synthetic mnist-shaped dataset, per-host feeding (jax 0.9's CPU
cross-process collectives default to gloo). Each process writes a flat
params dump; the test compares them against a single-process run of the
same configuration on the same global device count.

Invoked: python tests/_mp_worker.py <coordinator> <pid> <nproc> <out_dir>

`build()` is shared with the test so the single-process reference run uses
byte-identical data and configuration.
"""

import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(out_dir, coordinator=None, process_id=None, n_processes=None):
    """(model, train_ds, test_ds, args, masks, lambdas) — deterministic
    across processes (seeded synthetic data)."""
    from mvae_tpu.data.pipeline import ArrayDataset
    from mvae_tpu.models.mnist import MnistMVAE

    args = types.SimpleNamespace(
        coordinator=coordinator, process_id=process_id,
        n_processes=n_processes, distributed=False,
        n_latents=8, epochs=2, annealing_epochs=1, lr=1e-3,
        batch_size=16, log_interval=2, seed=0,
        resume=None, no_device_data=False, profile_dir=None,
        out_dir=out_dir)

    rng = np.random.default_rng(0)      # same data on every process

    def ds(n):
        return ArrayDataset({
            "image": (rng.random((n, 784)) < 0.3).astype(np.float32),
            "text": rng.integers(0, 10, size=n).astype(np.int32)})

    train_ds, test_ds = ds(128), ds(64)
    model = MnistMVAE(args.n_latents)
    masks = np.asarray([[1, 1], [1, 0], [0, 1]], np.float32)
    lambdas = np.asarray([[1.0, 50.0]] * 3, np.float32)
    return model, train_ds, test_ds, args, masks, lambdas


def flat_params(params):
    import jax
    return np.concatenate([np.asarray(v, np.float64).ravel()
                           for v in jax.tree_util.tree_leaves(params)])


def main():
    coord, pid, nproc, out_dir = sys.argv[1:5]
    # CPU backend with 4 virtual devices BEFORE any backend touch; the env
    # var alone is not enough here (sitecustomize pins a TPU plugin) — the
    # jax.config override below is what actually decides
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    from mvae_tpu.train.driver import run_training

    model, train_ds, test_ds, args, masks, lambdas = build(
        os.path.join(out_dir, "ckpt"),
        coordinator=coord, process_id=int(pid), n_processes=int(nproc))
    params, _ = run_training(
        model, train_ds, test_ds, args, masks, lambdas,
        out_dir=args.out_dir,
        meta={"model": "mnist", "n_latents": args.n_latents})

    assert jax.process_count() == int(nproc), jax.process_count()
    assert len(jax.devices()) == 4 * int(nproc), len(jax.devices())
    np.save(os.path.join(out_dir, f"params_{pid}.npy"), flat_params(params))


if __name__ == "__main__":
    main()
