"""On-device image transforms for the vision experiment.

The reference precomputes grayscale/edge/mask variants OFFLINE with
PIL/skimage/dlib/OpenCV (vision/setup.py:26-164) and computes obscure/
watermark per item in the host DataLoader (vision/datasets.py:97-129).
Here every transform is a JAX kernel (batched, fusable, runs on TPU), so
the 6-modality pipeline can be derived from the RGB source on device:

  grayscale: ITU-R 601-2 luminance (PIL 'L' convert) — a 3-vector contraction.
  canny:     separable Gaussian blur (sigma=2, skimage default invocation at
             vision/setup.py:161) -> Sobel -> direction-quantized non-max
             suppression -> double threshold + fixed-iteration hysteresis
             dilation (compiler-friendly bounded loop).
  obscure:   zero the right half of the WIDTH axis — the reference's
             obscure_image (vision/datasets.py:97-111) indexes axis 1 of an
             (H, W, C) array, i.e. columns, despite its "half height"
             comment; we reproduce the behavior, not the comment.
  watermark: straight alpha composite at (0,0) after resize
             (vision/datasets.py:114-129); the watermark itself is a
             deterministic procedurally-generated RGBA array (we ship no
             binary assets).
  mask:      landmark-region rasterization (convex fills) from PRECOMPUTED
             landmark points, white-canvas fallback when none — dlib's HOG
             face detector has no on-device equivalent (SURVEY.md §3.5), so
             detection stays an offline input, rendering is ours.

All functions take/return float32 in [0,1], NHWC (or HWC for singles).
"""

import jax
import jax.numpy as jnp
import numpy as np

# -- grayscale ---------------------------------------------------------------

LUMA = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def rgb_to_grayscale(img):
    """(..., H, W, 3) -> (..., H, W, 1). PIL convert('L') luminance."""
    return jnp.tensordot(img, LUMA, axes=([-1], [0]))[..., None]


# -- canny -------------------------------------------------------------------

def _gaussian_kernel1d(sigma: float, radius: int):
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum())


def _sep_blur(x, sigma=2.0):
    """Separable Gaussian blur on (B, H, W)."""
    radius = int(4.0 * sigma + 0.5)          # scipy truncate=4.0 default
    k = _gaussian_kernel1d(sigma, radius)
    kh = k.reshape(1, -1, 1, 1)              # HWIO, H axis
    kw = k.reshape(-1, 1, 1, 1)
    y = x[..., None]
    dims = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(y, kw, (1, 1),
                                     [(radius, radius), (0, 0)],
                                     dimension_numbers=dims)
    y = jax.lax.conv_general_dilated(y, kh, (1, 1),
                                     [(0, 0), (radius, radius)],
                                     dimension_numbers=dims)
    return y[..., 0]


_SOBEL_X = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = _SOBEL_X.T


def _conv3(x, k):
    dims = ("NHWC", "HWIO", "NHWC")
    return jax.lax.conv_general_dilated(
        x[..., None], k.reshape(3, 3, 1, 1), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=dims)[..., 0]


def canny_edges(img, sigma: float = 2.0, low: float = 0.1, high: float = 0.2,
                hysteresis_iters: int = 8):
    """Batched Canny. img: (B, H, W, 1) or (B, H, W, 3) in [0,1].
    Returns (B, H, W, 1) binary edges {0,1}.

    low/high thresholds are fractions of each image's max gradient
    (skimage uses absolute defaults 0.1/0.2 on [0,1] data after blur;
    per-image max scaling keeps synthetic + real data behaving)."""
    if img.shape[-1] == 3:
        img = rgb_to_grayscale(img)
    g = _sep_blur(img[..., 0], sigma)                         # (B, H, W)
    gx, gy = _conv3(g, _SOBEL_X), _conv3(g, _SOBEL_Y)
    mag = jnp.sqrt(gx * gx + gy * gy)

    # non-max suppression with direction quantized to 0/45/90/135 degrees
    ang = jnp.arctan2(gy, gx)                                  # [-pi, pi]
    d = jnp.mod(jnp.round(ang / (jnp.pi / 4.0)), 4).astype(jnp.int32)

    def shift(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=1), dx, axis=2)

    n0a, n0b = shift(mag, 0, 1), shift(mag, 0, -1)             # horizontal
    n1a, n1b = shift(mag, 1, 1), shift(mag, -1, -1)            # 45
    n2a, n2b = shift(mag, 1, 0), shift(mag, -1, 0)             # vertical
    n3a, n3b = shift(mag, 1, -1), shift(mag, -1, 1)            # 135
    na = jnp.select([d == 0, d == 1, d == 2, d == 3], [n0a, n1a, n2a, n3a])
    nb = jnp.select([d == 0, d == 1, d == 2, d == 3], [n0b, n1b, n2b, n3b])
    keep = (mag >= na) & (mag >= nb)

    peak = jnp.max(mag, axis=(1, 2), keepdims=True) + 1e-12
    strong = keep & (mag >= high * peak)
    weak = keep & (mag >= low * peak)

    # hysteresis: grow strong edges into weak ones (bounded dilation loop)
    def grow(s, _):
        dil = (s | shift(s, 0, 1) | shift(s, 0, -1) | shift(s, 1, 0)
               | shift(s, -1, 0) | shift(s, 1, 1) | shift(s, 1, -1)
               | shift(s, -1, 1) | shift(s, -1, -1))
        return dil & weak | s, None

    strong, _ = jax.lax.scan(grow, strong, None, length=hysteresis_iters)
    return strong.astype(jnp.float32)[..., None]


# -- obscure / watermark -----------------------------------------------------

def obscure(img):
    """Zero columns right of the width midpoint (+1), matching
    vision/datasets.py:105-109 exactly. img: (..., H, W, C)."""
    w = img.shape[-2]
    col = jnp.arange(w)
    keep = (col <= w // 2).astype(img.dtype)
    return img * keep[:, None]


def alpha_composite(img, overlay_rgba):
    """Paste RGBA overlay (H, W, 4) over (..., H, W, 3) at (0, 0) —
    PIL Image.paste(wm, (0,0), wm) semantics."""
    rgb = overlay_rgba[..., :3]
    a = overlay_rgba[..., 3:4]
    return img * (1.0 - a) + rgb * a


def make_watermark(h: int = 64, w: int = 64) -> np.ndarray:
    """Deterministic procedural RGBA watermark: two translucent diagonal
    bars + a frame (stands in for the reference's watermark.png asset —
    we ship no binaries)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    diag1 = np.abs(yy - xx) < h * 0.06
    diag2 = np.abs((h - 1 - yy) - xx) < h * 0.06
    frame = ((yy < 2) | (yy >= h - 2) | (xx < 2) | (xx >= w - 2))
    alpha = np.where(diag1 | diag2, 0.55, 0.0) + np.where(frame, 0.4, 0.0)
    rgba = np.zeros((h, w, 4), np.float32)
    rgba[..., 0] = 0.9   # warm gray mark
    rgba[..., 1] = 0.9
    rgba[..., 2] = 0.9
    rgba[..., 3] = np.clip(alpha, 0.0, 0.8)
    return rgba


def load_watermark(h: int = 64, w: int = 64, *, path: str = None,
                   data_dir: str = None) -> np.ndarray:
    """RGBA watermark in [0,1]. The reference alpha-pastes a binary asset,
    vision/watermark.png, resized bicubic to the image size
    (vision/datasets.py:114-129). To reproduce it exactly, drop that file at
    `path` (or `<data_dir>/watermark.png`); absent a user asset this falls
    back to the deterministic procedural mark (we ship no binaries)."""
    import os
    if path is None and data_dir is not None:
        cand = os.path.join(data_dir, "watermark.png")
        path = cand if os.path.isfile(cand) else None
    if path is None:
        return make_watermark(h, w)
    from PIL import Image
    im = Image.open(path).convert("RGBA").resize((w, h), Image.BICUBIC)
    return np.asarray(im, np.float32) / 255.0


# -- landmark mask rasterization ---------------------------------------------

# 68-point landmark region index ranges (iBUG 300-W convention, as used by
# the reference's FACIAL_LANDMARKS_IDXS via imutils, vision/setup.py)
LANDMARK_REGIONS = {
    "mouth": (48, 68), "right_eyebrow": (17, 22), "left_eyebrow": (22, 27),
    "right_eye": (36, 42), "left_eye": (42, 48), "nose": (27, 36),
    "jaw": (0, 17),
}


def _fill_convex(h, w, pts):
    """Rasterize the convex hull of pts ((N,2) xy) via half-plane tests."""
    pts = np.asarray(pts, np.float32)
    if len(pts) < 3:
        return np.zeros((h, w), bool)
    hull = _convex_hull(pts)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    inside = np.ones((h, w), bool)
    n = len(hull)
    for i in range(n):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % n]
        cross = (x2 - x1) * (yy - y1) - (y2 - y1) * (xx - x1)
        inside &= cross >= 0
    return inside


def _convex_hull(pts):
    """Andrew's monotone chain; returns CCW hull."""
    pts = sorted({(float(x), float(y)) for x, y in pts})
    if len(pts) <= 2:
        return list(pts)

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                (x1, y1), (x2, y2) = out[-2], out[-1]
                if (x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]


def _polyline(h, w, pts, thickness=2):
    mask = np.zeros((h, w), bool)
    pts = np.asarray(pts, np.float32)
    for (x1, y1), (x2, y2) in zip(pts[:-1], pts[1:]):
        steps = int(max(abs(x2 - x1), abs(y2 - y1)) * 2 + 1)
        for t in np.linspace(0.0, 1.0, steps):
            cx, cy = x1 + (x2 - x1) * t, y1 + (y2 - y1) * t
            y0, y1_ = int(max(cy - thickness, 0)), int(min(cy + thickness + 1, h))
            x0, x1_ = int(max(cx - thickness, 0)), int(min(cx + thickness + 1, w))
            mask[y0:y1_, x0:x1_] = True
    return mask


def landmark_mask(h: int, w: int, landmarks=None) -> np.ndarray:
    """Render the reference's landmark visualization (vision/setup.py:78-146):
    convex fills for eyes/brows/nose/mouth, a polyline for the jaw, drawn
    dark on a WHITE canvas; white canvas fallback when no landmarks
    (vision/setup.py:113-116). landmarks: (68, 2) xy points or None."""
    canvas = np.ones((h, w), np.float32)
    if landmarks is None:
        return canvas[..., None]
    landmarks = np.asarray(landmarks, np.float32)
    drawn = np.zeros((h, w), bool)
    for name, (lo, hi) in LANDMARK_REGIONS.items():
        pts = landmarks[lo:hi]
        if name == "jaw":
            drawn |= _polyline(h, w, pts)
        else:
            drawn |= _fill_convex(h, w, pts)
    canvas[drawn] = 0.0
    return canvas[..., None]
