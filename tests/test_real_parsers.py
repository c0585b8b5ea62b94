"""Real-file-format fixtures for the dataset parsers.

The synthetic fallbacks exercise the pipelines end to end, but a format
slip in the parsers would only surface on real-data day. These fixtures
reproduce the published file formats byte-for-byte in miniature:
  * CelebA Eval/list_eval_partition.txt + Anno/list_attr_celeba.txt
    (count line, 40-name header, right-aligned -1/1 columns) with real
    JPEGs of the true 178x218 aligned-crop geometry
    (reference parsers: /root/reference/celeba/datasets.py:155-183)
  * MNIST IDX files with the big-endian magic/dims header
"""

import gzip
import os
import struct

import numpy as np
import pytest

from mvae_tpu.data.celeba import (
    ATTR_TO_IX_DICT, ATTR_IX_TO_KEEP, load_eval_partition, load_attributes,
    load_celeba)
from mvae_tpu.data.mnist import load_mnist

ATTR_NAMES = [n for n, _ in sorted(ATTR_TO_IX_DICT.items(),
                                   key=lambda kv: kv[1])]


def _write_celeba_fixture(root, n=6):
    os.makedirs(os.path.join(root, "Eval"), exist_ok=True)
    os.makedirs(os.path.join(root, "Anno"), exist_ok=True)
    os.makedirs(os.path.join(root, "img_align_celeba"), exist_ok=True)
    rng = np.random.default_rng(0)
    attrs = rng.choice([-1, 1], size=(n, 40))
    # partition: 0,0,1,1,2,2 -> 2 train / 2 val / 2 test
    with open(os.path.join(root, "Eval", "list_eval_partition.txt"), "w") as f:
        for i in range(n):
            f.write(f"{i + 1:06d}.jpg {i * 3 // n}\n")
    with open(os.path.join(root, "Anno", "list_attr_celeba.txt"), "w") as f:
        f.write(f"{n}\n")
        f.write(" ".join(ATTR_NAMES) + " \n")
        for i in range(n):
            cols = "".join(f"{v:3d}" for v in attrs[i])   # right-aligned
            f.write(f"{i + 1:06d}.jpg {cols}\n")
    from PIL import Image
    for i in range(n):
        arr = np.full((218, 178, 3), (i + 1) * 30, np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "img_align_celeba", f"{i + 1:06d}.jpg"))
    return attrs


def test_celeba_partition_and_attr_parsers(tmp_path):
    pytest.importorskip("PIL")
    root = str(tmp_path)
    raw_attrs = _write_celeba_fixture(root)
    train = load_eval_partition("train", root)
    val = load_eval_partition("val", root)
    test = load_eval_partition("test", root)
    assert train == ["000001.jpg", "000002.jpg"]
    assert val == ["000003.jpg", "000004.jpg"]
    assert test == ["000005.jpg", "000006.jpg"]

    got = load_attributes(val, "val", root)
    assert got.shape == (2, 18) and got.dtype == np.float32
    want = raw_attrs[2:4].copy()
    want[want < 0] = 0
    np.testing.assert_array_equal(got, want[:, ATTR_IX_TO_KEEP])
    # second call hits the .npy cache and must agree
    assert os.path.isfile(os.path.join(root, "Anno", "attr_val.npy"))
    np.testing.assert_array_equal(load_attributes(val, "val", root), got)


def test_celeba_end_to_end_real_files(tmp_path):
    pytest.importorskip("PIL")
    root = str(tmp_path)
    _write_celeba_fixture(root)
    ds = load_celeba(root, "train", synthetic_ok=False)
    assert ds.arrays["image"].shape == (2, 64, 64, 3)
    assert ds.arrays["attrs"].shape == (2, 18)
    # constant-gray JPEG -> constant value survives resize+center-crop
    img0 = ds.arrays["image"][0]
    assert abs(float(img0.mean()) - 30 / 255) < 0.02
    assert float(img0.std()) < 0.02


def _write_idx(path, arr, gz=False):
    dtype_code = 0x08  # uint8
    header = struct.pack(">I", (dtype_code << 8) | arr.ndim)
    header += struct.pack(">" + "I" * arr.ndim, *arr.shape)
    op = gzip.open if gz else open
    with op(path, "wb") as f:
        f.write(header + arr.astype(np.uint8).tobytes())


@pytest.mark.parametrize("gz", [False, True])
def test_mnist_idx_reader(tmp_path, gz):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (5, 28, 28)).astype(np.uint8)
    labs = np.arange(5, dtype=np.uint8)
    sfx = ".gz" if gz else ""
    _write_idx(str(raw / ("train-images-idx3-ubyte" + sfx)), imgs, gz)
    _write_idx(str(raw / ("train-labels-idx1-ubyte" + sfx)), labs, gz)
    ds = load_mnist(str(tmp_path), train=True, synthetic_ok=False)
    assert ds.arrays["image"].shape == (5, 784)
    np.testing.assert_allclose(
        ds.arrays["image"].reshape(5, 28, 28), imgs / 255.0, atol=1e-6)
    np.testing.assert_array_equal(ds.arrays["text"], labs)
