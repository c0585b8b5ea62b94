"""On-device image transforms for the vision experiment.

The reference precomputes grayscale/edge/mask variants OFFLINE with
PIL/skimage/dlib/OpenCV (vision/setup.py:26-164) and computes obscure/
watermark per item in the host DataLoader (vision/datasets.py:97-129).
Here every transform is a JAX kernel (batched, fusable, runs on TPU), so
the 6-modality pipeline can be derived from the RGB source on device:

  grayscale: ITU-R 601-2 luminance (PIL 'L' convert) — a 3-vector contraction.
  canny:     separable Gaussian blur with constant-mode bleed-over
             normalization (sigma=2, skimage default invocation at
             vision/setup.py:161) -> Sobel -> gradient-interpolated non-max
             suppression (skimage octant semantics) -> double threshold +
             hysteresis grown to fixpoint (lax.while_loop; exact
             8-connected-component semantics) or a bounded dilation loop.
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


def _interp_nms(mag, gy, gx):
    """skimage-style interpolated non-max suppression on (B, H, W).

    Per pixel the gradient (gy = d/drow, gx = d/dcol) selects one of four
    octant-pairs; the magnitude along +/- the gradient direction is LINEARLY
    INTERPOLATED between the two adjacent lattice neighbors (weight
    w = min|g|/max|g|) and the pixel survives iff its own magnitude is >=
    both interpolated values. This is the published skimage.feature.canny
    NMS (the reference's edge stage, vision/setup.py:72 with defaults), not
    the cruder 4-way direction quantization. Borders and zero-gradient
    pixels are excluded, as skimage's eroded mask does."""
    ai, aj = jnp.abs(gy), jnp.abs(gx)

    def s(dy, dx):   # out[y, x] = mag[y + dy, x + dx] (wrap; border masked)
        return jnp.roll(mag, (-dy, -dx), axis=(1, 2))

    m_d, m_u, m_r, m_l = s(1, 0), s(-1, 0), s(0, 1), s(0, -1)
    m_dr, m_ul, m_ur, m_dl = s(1, 1), s(-1, -1), s(-1, 1), s(1, -1)

    w1 = jnp.where(ai > 0, aj / jnp.where(ai > 0, ai, 1.0), 0.0)  # aj <= ai
    w2 = jnp.where(aj > 0, ai / jnp.where(aj > 0, aj, 1.0), 0.0)  # ai <= aj

    def keep(w, c1p, c2p, c1m, c2m):
        return ((c2p * w + c1p * (1.0 - w) <= mag)
                & (c2m * w + c1m * (1.0 - w) <= mag))

    same = ((gy >= 0) & (gx >= 0)) | ((gy <= 0) & (gx <= 0))
    opp = ((gy <= 0) & (gx >= 0)) | ((gy >= 0) & (gx <= 0))
    # octants in skimage's processing order (later writes win on ties -> the
    # LAST matching case takes priority, so select() sees them reversed)
    cases = [
        (opp & (ai >= aj), keep(w1, m_u, m_ur, m_d, m_dl)),    # 135-180
        (opp & (ai <= aj), keep(w2, m_r, m_ur, m_l, m_dl)),    # 90-135
        (same & (ai <= aj), keep(w2, m_r, m_dr, m_l, m_ul)),   # 45-90
        (same & (ai >= aj), keep(w1, m_d, m_dr, m_u, m_ul)),   # 0-45
    ]
    out = jnp.select([c for c, _ in cases], [k for _, k in cases],
                     jnp.zeros((), bool))
    h, w = mag.shape[1], mag.shape[2]
    interior = ((jnp.arange(h) % (h - 1) != 0)[:, None]
                & (jnp.arange(w) % (w - 1) != 0)[None, :])
    return out & (mag > 0) & interior


def canny_edges(img, sigma: float = 2.0, low: float = 0.1, high: float = 0.2,
                hysteresis_iters=None, threshold_mode: str = "relative"):
    """Batched Canny. img: (B, H, W, 1) or (B, H, W, 3) in [0,1].
    Returns (B, H, W, 1) binary edges {0,1}.

    threshold_mode:
      * "relative" (default): low/high are fractions of each image's max
        gradient — per-image scaling keeps synthetic + real data behaving.
      * "absolute": low/high are absolute gradient-magnitude thresholds,
        matching skimage.feature.canny's defaults (0.1/0.2) — the exact
        semantics the reference's offline edge stage used
        (vision/setup.py:72,161: feature.canny(gray/255, sigma=2)). Use
        this to regenerate/match reference-precomputed edge directories
        (PARITY.md "Deliberate divergences"; oracle-checked against a
        scipy.ndimage reimplementation in tests/test_image_transforms.py).

    hysteresis_iters: None (default) grows strong edges into weak ones to
    FIXPOINT via lax.while_loop — exact 8-connected hysteresis, skimage's
    connected-component semantics. An int bounds the dilation loop instead
    (compiler-static, for pipelines that must avoid while_loop)."""
    if img.shape[-1] == 3:
        img = rgb_to_grayscale(img)
    x = img[..., 0]
    # constant-mode bleed-over normalization: skimage smooths with cval=0
    # and divides by the blurred all-ones mask so borders aren't darkened
    g = _sep_blur(x, sigma) / _sep_blur(jnp.ones_like(x), sigma)
    gx, gy = _conv3(g, _SOBEL_X), _conv3(g, _SOBEL_Y)
    mag = jnp.sqrt(gx * gx + gy * gy)

    keep = _interp_nms(mag, gy, gx)

    if threshold_mode == "absolute":
        lo_t, hi_t = low, high
    elif threshold_mode == "relative":
        # peak over NMS-surviving pixels (borders excluded), so the scale
        # reflects actual candidate edges, not crop/pad boundary gradients
        peak = jnp.max(jnp.where(keep, mag, 0.0), axis=(1, 2),
                       keepdims=True) + 1e-12
        lo_t, hi_t = low * peak, high * peak
    else:
        raise ValueError(f"threshold_mode={threshold_mode!r} "
                         "(want 'relative' or 'absolute')")
    strong = keep & (mag >= hi_t)
    weak = keep & (mag >= lo_t)

    def shift(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=1), dx, axis=2)

    def grow(s):
        dil = (s | shift(s, 0, 1) | shift(s, 0, -1) | shift(s, 1, 0)
               | shift(s, -1, 0) | shift(s, 1, 1) | shift(s, 1, -1)
               | shift(s, -1, 1) | shift(s, -1, -1))
        return dil & weak | s

    if hysteresis_iters is None:
        def body(c):
            s, _ = c
            ns = grow(s)
            return ns, jnp.any(ns != s)

        strong, _ = jax.lax.while_loop(
            lambda c: c[1], body, (strong, jnp.asarray(True)))
    else:
        strong, _ = jax.lax.scan(lambda s, _: (grow(s), None), strong,
                                 None, length=hysteresis_iters)
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
