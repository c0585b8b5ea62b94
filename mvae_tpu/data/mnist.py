"""MNIST / FashionMNIST loading.

The reference uses torchvision's downloader (mnist/train.py:159-165;
fashionmnist/datasets.py:8-29 only swaps URLs). This environment has no
network egress, so we read the standard IDX files if present under
`<root>/MNIST/raw` (or `<root>/FashionMNIST/raw`) and otherwise fall back to
a DETERMINISTIC synthetic set with the same shapes/dtypes — enough for
training-dynamics tests and benchmarks.

Images are float32 in [0,1] shaped (N, 784) (the mnist MLP flattens anyway,
mnist/model.py:82); labels int32 (N,).
"""

import gzip
import os
import struct

import numpy as np

from mvae_tpu.data.pipeline import ArrayDataset, warn_synthetic

_FILES = {
    True: ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    False: ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
}


def _read_idx(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(dims)


def _find(raw_dir, stem):
    for suffix in ("", ".gz"):
        p = os.path.join(raw_dir, stem + suffix)
        if os.path.exists(p):
            return p
    return None


def load_mnist(root="./data", train=True, *, variant="MNIST",
               flatten=True, synthetic_ok=True, download=False):
    if download:
        # reference parity: torchvision download-once (mnist/train.py:159);
        # FashionMNIST only swaps the URL table (fashionmnist/datasets.py)
        from mvae_tpu.data.download import download_idx, DownloadError
        try:
            download_idx(root, variant)
        except (DownloadError, OSError) as e:
            print(f"[mvae_tpu] --download failed ({e}); "
                  "falling back to local files / synthetic data")
    raw = os.path.join(root, variant, "raw")
    img_stem, lab_stem = _FILES[train]
    ip, lp = _find(raw, img_stem), _find(raw, lab_stem)
    if ip and lp:
        images = _read_idx(ip).astype(np.float32) / 255.0
        labels = _read_idx(lp).astype(np.int32)
    elif synthetic_ok:
        warn_synthetic(variant, raw)
        images, labels = synthetic_mnist(60000 if train else 10000,
                                         seed=0 if train else 1)
    else:
        raise FileNotFoundError(f"no {variant} IDX files under {raw}")
    if flatten:
        images = images.reshape(len(images), 784)
    else:
        images = images.reshape(len(images), 28, 28, 1)
    return ArrayDataset({"image": images, "text": labels})


def synthetic_mnist(n, seed=0, size=28):
    """Class-structured synthetic digits with MNIST-like ink statistics:
    sparse bright strokes (~15-20% of pixels) on a black background, one
    smooth stroke template per class plus per-sample amplitude/noise
    jitter. Deterministic; gives the VAE real structure to compress, and
    keeps the MultiMNIST sum-overlap rejection feasible (dense blobs make
    a 4-digit canvas unsatisfiable, where real MNIST's sparse ink is what
    lets the reference's rejection loop terminate)."""
    rng = np.random.default_rng(seed)
    templates = rng.random((10, size, size)).astype(np.float32)
    # cheap separable smoothing for spatial correlation
    k = np.array([0.25, 0.5, 0.25], np.float32)
    for _ in range(4):
        templates = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), 1, templates)
        templates = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), 2, templates)
    # keep only the brightest ridge of the field -> stroke-like sparsity
    thresh = np.quantile(templates, 0.82, axis=(1, 2), keepdims=True)
    templates = np.clip((templates - thresh) * 12.0, 0.0, 1.0)
    # digits live mostly in the center of the tile, like MNIST
    ax = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    win = np.exp(-2.0 * (ax[None, :] ** 2 + ax[:, None] ** 2))
    templates *= np.clip(win * 1.6, 0.0, 1.0)
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    ink = templates[labels]
    amp = rng.uniform(0.75, 1.0, (n, 1, 1)).astype(np.float32)
    noise = rng.normal(0, 0.08, (n, size, size)).astype(np.float32)
    images = np.clip(ink * amp + noise * (ink > 0.02), 0.0, 1.0)
    return images, labels
