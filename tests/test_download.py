"""Offline tests of the dataset downloader (data/download.py): URL table
parity with the reference, checksum verification, placement, download-once,
and graceful degradation — `fetch` is injected so nothing touches the
network (zero-egress environment)."""

import gzip
import hashlib
import os
import struct

import numpy as np
import pytest

from mvae_tpu.data.download import (
    DownloadError, URL_TABLES, _md5, download_idx)

IDX_NAMES = ["train-images-idx3-ubyte.gz", "train-labels-idx1-ubyte.gz",
             "t10k-images-idx3-ubyte.gz", "t10k-labels-idx1-ubyte.gz"]


def test_url_tables_cover_both_variants():
    for variant in ("MNIST", "FashionMNIST"):
        assert sorted(URL_TABLES[variant]) == sorted(IDX_NAMES)
        for fname, (md5, urls) in URL_TABLES[variant].items():
            assert len(md5) == 32 and int(md5, 16) >= 0
            assert urls and all(u.startswith("http") for u in urls)
            assert all(u.endswith(fname) for u in urls)


def test_fashion_urls_match_reference_table():
    # fashionmnist/datasets.py:24-29 — the reference's exact URL list
    base = "http://fashion-mnist.s3-website.eu-central-1.amazonaws.com"
    got = {u for _, (_, urls) in URL_TABLES["FashionMNIST"].items()
           for u in urls}
    assert got == {f"{base}/{n}" for n in IDX_NAMES}


def _idx_bytes(dims, seed=0):
    rng = np.random.default_rng(seed)
    magic = struct.pack(">I", (0x08 << 8) | len(dims))
    body = rng.integers(0, 255, int(np.prod(dims)), dtype=np.uint8)
    return (magic + b"".join(struct.pack(">I", d) for d in dims)
            + body.tobytes())


def _fake_tree(tmp_path, variant="MNIST", n=32):
    """Valid gz IDX archives + a URL table whose md5s match them."""
    files = {
        "train-images-idx3-ubyte.gz": _idx_bytes((n, 28, 28), 0),
        "train-labels-idx1-ubyte.gz": _idx_bytes((n,), 1),
        "t10k-images-idx3-ubyte.gz": _idx_bytes((n // 2, 28, 28), 2),
        "t10k-labels-idx1-ubyte.gz": _idx_bytes((n // 2,), 3),
    }
    blobs, table = {}, {}
    for fname, raw in files.items():
        gz = gzip.compress(raw)
        url = f"http://example.test/{fname}"
        blobs[url] = gz
        table[fname] = (hashlib.md5(gz).hexdigest(), [url])
    return blobs, table


def test_download_places_and_verifies(tmp_path, monkeypatch):
    blobs, table = _fake_tree(tmp_path)
    monkeypatch.setitem(URL_TABLES, "MNIST", table)
    calls = []

    def fetch(url, dst, timeout=60.0):
        calls.append(url)
        with open(dst, "wb") as f:
            f.write(blobs[url])

    raw = download_idx(str(tmp_path), "MNIST", fetch=fetch, verbose=False)
    assert raw == os.path.join(str(tmp_path), "MNIST", "raw")
    assert sorted(os.listdir(raw)) == sorted(IDX_NAMES)
    assert len(calls) == 4

    # download-once: verified files are not re-fetched
    download_idx(str(tmp_path), "MNIST", fetch=fetch, verbose=False)
    assert len(calls) == 4

    # ... and the loader reads what was placed (real IDX parse path)
    from mvae_tpu.data.mnist import load_mnist
    ds = load_mnist(str(tmp_path), train=True, synthetic_ok=False)
    assert ds.arrays["image"].shape == (32, 784)


def test_checksum_mismatch_tries_next_then_errors(tmp_path, monkeypatch):
    blobs, table = _fake_tree(tmp_path)
    fname = IDX_NAMES[0]
    md5, (url,) = table[fname]
    table[fname] = (md5, ["http://bad.test/" + fname, url])
    monkeypatch.setitem(URL_TABLES, "MNIST", table)

    def fetch(u, dst, timeout=60.0):
        with open(dst, "wb") as f:
            f.write(b"garbage" if "bad.test" in u else blobs[u])

    raw = download_idx(str(tmp_path), "MNIST", fetch=fetch, verbose=False)
    assert _md5(os.path.join(raw, fname)) == md5   # fell through to good URL

    # every URL failing -> DownloadError naming the file and the remedy
    table[fname] = (md5, ["http://bad.test/" + fname])
    os.unlink(os.path.join(raw, fname))
    with pytest.raises(DownloadError, match=fname):
        download_idx(str(tmp_path), "MNIST", fetch=fetch, verbose=False)


def test_no_egress_degrades_to_synthetic(tmp_path, monkeypatch, capsys):
    def fetch(u, dst, timeout=60.0):
        raise OSError("network unreachable")

    monkeypatch.setattr("mvae_tpu.data.download._fetch", fetch)
    from mvae_tpu.data.mnist import load_mnist
    ds = load_mnist(str(tmp_path), train=False, download=True)
    assert ds.arrays["image"].shape == (10000, 784)   # synthetic fallback
    assert "--download failed" in capsys.readouterr().out
