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


def _smooth_rgb(h, w, seed=0):
    """Natural-image-like smooth gradient + low-frequency blobs (noise
    images exaggerate resampling-filter differences)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 100 * np.sin(x / w * 3 + c) * np.cos(y / h * 2 + c)
        for c in range(3)], axis=-1)
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_decode_jpeg_png_64_close_to_pil(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image
    arr = _smooth_rgb(218, 178)         # the CelebA aligned-crop geometry
    jp = str(tmp_path / "t.jpg")
    pp = str(tmp_path / "t.png")
    Image.fromarray(arr).save(jp, quality=95)
    Image.fromarray(arr).save(pp)

    def pil64(p):
        im = Image.open(p).convert('RGB')
        w, h = im.size
        s = 64 / min(w, h)
        im = im.resize((max(64, round(w * s)), max(64, round(h * s))),
                       Image.BILINEAR)
        w, h = im.size
        left, top = (w - 64) // 2, (h - 64) // 2
        return np.asarray(im.crop((left, top, left + 64, top + 64)))

    for path in (jp, pp):
        got = native.decode_image_64(path)
        want = pil64(path)
        assert got.shape == (64, 64, 3) and got.dtype == np.uint8
        # documented divergence: our box+bilinear vs PIL's antialiased
        # BILINEAR — close on natural images, not bit-identical
        diff = np.abs(got.astype(int) - want.astype(int)).mean()
        assert diff < 4.0, f"{path}: mean abs diff {diff}"

    with pytest.raises(ValueError):
        native.decode_image_64(str(tmp_path / "missing.jpg"))


def test_celeba_loader_uses_native_decode(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image
    from mvae_tpu.data.celeba import load_celeba
    root = tmp_path
    (root / "Eval").mkdir()
    (root / "Anno").mkdir()
    (root / "img_align_celeba").mkdir()
    with open(root / "Eval" / "list_eval_partition.txt", "w") as f:
        f.write("000001.jpg 0\n000002.jpg 0\n")
    names = sorted(
        __import__("mvae_tpu.data.celeba", fromlist=["ATTR_TO_IX_DICT"]
                   ).ATTR_TO_IX_DICT,
        key=lambda k: __import__("mvae_tpu.data.celeba",
                                 fromlist=["ATTR_TO_IX_DICT"]
                                 ).ATTR_TO_IX_DICT[k])
    with open(root / "Anno" / "list_attr_celeba.txt", "w") as f:
        f.write("2\n" + " ".join(names) + "\n")
        f.write("000001.jpg" + " 1" * 40 + "\n")
        f.write("000002.jpg" + " -1" * 40 + "\n")
    for i in (1, 2):
        Image.fromarray(_smooth_rgb(218, 178, seed=i)).save(
            root / "img_align_celeba" / f"{i:06d}.jpg")
    ds = load_celeba(str(root), "train", synthetic_ok=False)
    assert ds.arrays["image"].shape == (2, 64, 64, 3)
    assert 0.0 <= ds.arrays["image"].min() <= ds.arrays["image"].max() <= 1.0
    assert ds.arrays["image"].std() > 0.05     # real pixels, not blanks


def test_gather_rows_parity():
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.uint8):
        src = (rng.random((64, 5, 2)) * 100).astype(dtype)
        idx = rng.permutation(64)[:17].astype(np.int64)
        np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])
