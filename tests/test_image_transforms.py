"""Image-kernel tests: grayscale/obscure exactness, canny structure +
oracle parity, watermark compositing, landmark rasterization + fallback."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.image import transforms as T


def test_grayscale_luminance():
    rng = np.random.default_rng(0)
    x = rng.random((2, 8, 8, 3)).astype(np.float32)
    g = np.asarray(T.rgb_to_grayscale(jnp.asarray(x)))
    want = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    np.testing.assert_allclose(g[..., 0], want, rtol=1e-5)
    assert g.shape == (2, 8, 8, 1)


def test_obscure_zeros_right_width_half():
    x = np.ones((1, 4, 10, 3), np.float32)
    y = np.asarray(T.obscure(jnp.asarray(x)))
    # reference zeros columns center_h+1: where center_h = W//2 = 5
    np.testing.assert_array_equal(y[0, :, :6, :], 1.0)
    np.testing.assert_array_equal(y[0, :, 6:, :], 0.0)


def test_canny_finds_a_box_edge():
    x = np.zeros((1, 64, 64, 1), np.float32)
    x[0, 16:48, 16:48, 0] = 1.0
    e = np.asarray(T.canny_edges(jnp.asarray(x)))
    assert e.shape == (1, 64, 64, 1)
    assert set(np.unique(e)) <= {0.0, 1.0}
    # edges fire near the box boundary, none deep inside/outside
    assert e[0, 30:34, 30:34].sum() == 0.0        # interior quiet
    assert e[0, 12:20, 24:40].sum() > 0           # top boundary band fires
    assert e.sum() < 64 * 64 * 0.2                # sparse


def test_canny_blank_image_no_edges():
    x = np.zeros((1, 32, 32, 1), np.float32)
    e = np.asarray(T.canny_edges(jnp.asarray(x)))
    assert e.sum() == 0.0


def _canny_oracle(image, sigma=2.0, low=0.1, high=0.2):
    """Independent scipy.ndimage reimplementation of skimage.feature.canny
    (the reference's edge stage, vision/setup.py:72): constant-mode Gaussian
    with bleed-over renormalization, ndi Sobel, slice-indexed interpolated
    NMS per the published algorithm, EXACT connected-component hysteresis
    via ndi.label. float64, numpy slicing — a different code path from the
    jax kernel's rolled/selected form in every step."""
    import scipy.ndimage as ndi
    image = np.asarray(image, np.float64)
    smoothed = ndi.gaussian_filter(image, sigma, mode='constant')
    bleed = ndi.gaussian_filter(np.ones_like(image), sigma, mode='constant')
    smoothed = smoothed / (bleed + np.finfo(float).eps)
    isobel = ndi.sobel(smoothed, axis=0)
    jsobel = ndi.sobel(smoothed, axis=1)
    magnitude = np.hypot(isobel, jsobel)
    abs_i, abs_j = np.abs(isobel), np.abs(jsobel)
    eroded = np.zeros(image.shape, bool)
    eroded[1:-1, 1:-1] = True
    eroded &= magnitude > 0
    local_maxima = np.zeros(image.shape, bool)

    def octant(pts, w, plus, minus):
        # plus/minus: ((dy1, dx1), (dy2, dx2)) neighbor offsets; the value
        # along the gradient is c2*w + c1*(1-w), survive iff both <= mag
        def interp(offs):
            (dy1, dx1), (dy2, dx2) = offs
            c1 = np.roll(magnitude, (-dy1, -dx1), (0, 1))
            c2 = np.roll(magnitude, (-dy2, -dx2), (0, 1))
            return c2 * w + c1 * (1.0 - w)
        k = (interp(plus) <= magnitude) & (interp(minus) <= magnitude)
        local_maxima[pts] = k[pts]

    with np.errstate(divide='ignore', invalid='ignore'):
        w1 = np.where(abs_i > 0, abs_j / abs_i, 0.0)
        w2 = np.where(abs_j > 0, abs_i / abs_j, 0.0)
    same = ((isobel >= 0) & (jsobel >= 0)) | ((isobel <= 0) & (jsobel <= 0))
    opp = ((isobel <= 0) & (jsobel >= 0)) | ((isobel >= 0) & (jsobel <= 0))
    octant(eroded & same & (abs_i >= abs_j), w1,
           ((1, 0), (1, 1)), ((-1, 0), (-1, -1)))
    octant(eroded & same & (abs_i <= abs_j), w2,
           ((0, 1), (1, 1)), ((0, -1), (-1, -1)))
    octant(eroded & opp & (abs_i <= abs_j), w2,
           ((0, 1), (-1, 1)), ((0, -1), (1, -1)))
    octant(eroded & opp & (abs_i >= abs_j), w1,
           ((-1, 0), (-1, 1)), ((1, 0), (1, -1)))

    low_mask = local_maxima & (magnitude >= low)
    high_mask = low_mask & (magnitude >= high)
    labels, count = ndi.label(low_mask, np.ones((3, 3)))
    if count == 0:
        return high_mask
    keep = np.zeros(count + 1, bool)
    keep[1:] = ndi.sum_labels(high_mask, labels, np.arange(1, count + 1)) > 0
    return keep[labels] & low_mask


def _face_like_batch(n=4, size=64, seed=3):
    from mvae_tpu.data.celeba import synthetic_celeba
    return synthetic_celeba(n, seed=seed, size=size).arrays["image"][:n]


def test_canny_absolute_matches_scipy_oracle():
    """Absolute mode == the skimage algorithm, cross-checked against an
    independent float64 scipy.ndimage reimplementation on synthetic faces
    (IoU; exact equality is impossible across f32 conv vs f64 ndi paths)."""
    rgb = _face_like_batch()
    got = np.asarray(T.canny_edges(jnp.asarray(rgb),
                                   threshold_mode="absolute"))[..., 0] > 0.5
    for b in range(rgb.shape[0]):
        gray = (0.299 * rgb[b, ..., 0] + 0.587 * rgb[b, ..., 1]
                + 0.114 * rgb[b, ..., 2])
        want = _canny_oracle(gray)
        inter = (got[b] & want).sum()
        union = (got[b] | want).sum()
        assert union > 50, "oracle found no edges — batch not face-like"
        assert inter / union > 0.9, (b, inter / union)


def test_canny_absolute_matches_skimage_exact():
    skimage = pytest.importorskip("skimage")
    from skimage import feature
    rgb = _face_like_batch()
    got = np.asarray(T.canny_edges(jnp.asarray(rgb),
                                   threshold_mode="absolute"))[..., 0] > 0.5
    for b in range(rgb.shape[0]):
        gray = (0.299 * rgb[b, ..., 0] + 0.587 * rgb[b, ..., 1]
                + 0.114 * rgb[b, ..., 2])
        want = feature.canny(gray.astype(np.float64), sigma=2.0)
        iou = (got[b] & want).sum() / max((got[b] | want).sum(), 1)
        assert iou > 0.9, (b, iou, skimage.__version__)


def test_canny_bounded_hysteresis_subset_of_fixpoint():
    rgb = _face_like_batch(2)
    full = np.asarray(T.canny_edges(jnp.asarray(rgb)))
    capped = np.asarray(T.canny_edges(jnp.asarray(rgb),
                                      hysteresis_iters=2))
    assert ((capped == 1) <= (full == 1)).all()
    assert full.sum() >= capped.sum()


def test_watermark_composite():
    wm = T.make_watermark(16, 16)
    assert wm.shape == (16, 16, 4)
    x = np.zeros((1, 16, 16, 3), np.float32)
    y = np.asarray(T.alpha_composite(jnp.asarray(x), jnp.asarray(wm)))
    # where alpha>0 the dark image brightens; elsewhere unchanged
    a = wm[..., 3]
    assert (y[0, a > 0.5].mean()) > 0.3
    np.testing.assert_array_equal(y[0][a == 0.0], 0.0)


def test_landmark_mask_and_fallback():
    from mvae_tpu.data.vision import synthetic_landmarks
    white = T.landmark_mask(64, 64, None)
    np.testing.assert_array_equal(white, np.ones((64, 64, 1)))
    m = T.landmark_mask(64, 64, synthetic_landmarks())
    assert m.shape == (64, 64, 1)
    assert m.min() == 0.0 and m.max() == 1.0      # drew something
    assert 0.02 < (m == 0).mean() < 0.9


def test_derive_modalities_shapes():
    from mvae_tpu.data.vision import derive_modalities
    rng = np.random.default_rng(1)
    rgb = rng.random((3, 64, 64, 3)).astype(np.float32)
    mods = derive_modalities(rgb, seed=0)
    assert set(mods) == {"image", "gray", "edge", "mask", "obscured",
                         "watermark"}
    for k, c in [("image", 3), ("gray", 1), ("edge", 1), ("mask", 1),
                 ("obscured", 3), ("watermark", 3)]:
        assert mods[k].shape == (3, 64, 64, c), k
        assert mods[k].min() >= 0.0 and mods[k].max() <= 1.0, k
