"""Host-side input pipeline.

The reference feeds torch DataLoaders (mnist/train.py:159-165). Here data
lives in host numpy arrays; per-epoch shuffling uses a seeded generator; each
batch is a dict name -> array that jit moves (or shards) onto the device
mesh. All shapes are static: the final ragged batch is DROPPED in training
(shuffled, so every example is seen across epochs) and padded+masked paths
are unnecessary for eval because the experiment batch sizes divide the
canonical dataset sizes (60000/10000 % 100 == 0).
"""

import numpy as np


def warn_synthetic(dataset: str, root: str):
    """One loud line when a loader falls back to synthetic data, so a
    mistyped --data-dir cannot silently train on the fallback set."""
    print(f"[mvae_tpu.data] {dataset}: no real data under {root!r} — "
          f"using the deterministic synthetic fallback")


class ArrayDataset:
    """dict of parallel numpy arrays, first axis = examples."""

    def __init__(self, arrays: dict):
        ns = {len(v) for v in arrays.values()}
        assert len(ns) == 1, "modalities must be parallel"
        self.arrays = arrays
        self.n = ns.pop()

    def __len__(self):
        return self.n


def batches(ds: ArrayDataset, batch_size: int, *, shuffle: bool,
            seed: int = 0, epoch: int = 0, drop_remainder: bool = None):
    """Yield dict batches. Training: shuffle per epoch, drop ragged tail."""
    if drop_remainder is None:
        drop_remainder = shuffle
    idx = np.arange(ds.n)
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        rng.shuffle(idx)
    gather = _gather_fn()
    stop = ds.n - (ds.n % batch_size) if drop_remainder else ds.n
    for i in range(0, stop, batch_size):
        take = idx[i:i + batch_size]
        yield {k: gather(v, take) for k, v in ds.arrays.items()}


def _gather_fn():
    """Native memcpy batch gather when the C++ library is built; numpy
    fancy-indexing otherwise."""
    try:
        from mvae_tpu.data import native
        if native.available():
            return native.gather_rows
    except Exception:
        pass
    return lambda v, take: v[take]


def num_batches(n: int, batch_size: int, drop_remainder: bool) -> int:
    return n // batch_size if drop_remainder else -(-n // batch_size)


def shard_batch(batch: dict, sharding):
    """Place a host batch with a NamedSharding (data-parallel feeding)."""
    import jax
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
