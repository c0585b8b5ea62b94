"""Image-kernel tests: grayscale/obscure exactness, canny structure,
watermark compositing, landmark rasterization + white fallback."""

import jax.numpy as jnp
import numpy as np

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
