"""Native C++ host-pipeline library: build, determinism, validity, and
gather parity. Skips when no compiler is available."""

import numpy as np
import pytest

from mvae_tpu.data import native
from mvae_tpu.data.mnist import synthetic_mnist

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


def test_generator_deterministic_and_valid():
    imgs, labels = synthetic_mnist(200, seed=0)
    digits = (imgs * 255).astype(np.uint8)
    a_img, a_txt = native.multimnist_generate(digits, labels, 300)
    b_img, b_txt = native.multimnist_generate(digits, labels, 300)
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_txt, b_txt)
    assert a_img.shape == (300, 50, 50) and a_img.dtype == np.uint8
    assert a_txt.shape == (300, 4) and 0 <= a_txt.min() and a_txt.max() <= 11
    counts = (a_txt != 11).sum(1)
    # k ~ U{0..4}: all five digit counts occur
    assert set(np.unique(counts)) == {0, 1, 2, 3, 4}
    # canvases with digits are non-empty; 0-digit canvases are blank
    assert a_img[counts == 0].max() == 0
    assert (a_img[counts > 0].reshape(-1, 2500).max(1) > 0).all()


def test_generator_respects_digit_range():
    imgs, labels = synthetic_mnist(100, seed=1)
    digits = (imgs * 255).astype(np.uint8)
    _, txt = native.multimnist_generate(digits, labels, 100,
                                        min_digits=2, max_digits=3)
    counts = (txt != 11).sum(1)
    assert counts.min() >= 2 and counts.max() <= 3


def test_gather_rows_parity():
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.uint8):
        src = (rng.random((64, 5, 2)) * 100).astype(dtype)
        idx = rng.permutation(64)[:17].astype(np.int64)
        np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])
