"""CelebVision dataset: six aligned image modalities.

Reference flow (/root/reference/vision/datasets.py:19-94): per item load the
RGB image plus PRECOMPUTED grayscale/edge/mask variants from sibling dirs
`img_align_celeba_{grayscale,edge,mask}`, compute obscured and watermarked
on the fly, resize/center-crop 64, and INVERT the mask (1 - mask, :87).

TPU-native reorganization: modalities are DERIVED from the RGB batch with
the jax kernels in mvae_tpu.image.transforms (device-side, fused), except
the landmark mask which needs offline detection — we consume the
precomputed mask dir when present and otherwise rasterize from a
deterministic synthetic landmark layout (white-canvas fallback preserved).

Also fixes the reference's bugs (SURVEY §2.6): grayscale_image NameError
(:79,:90) and watermarking the OBSCURED image instead of a fresh RGB copy
(:75).
"""

import os

import numpy as np

from mvae_tpu.data.celeba import load_celeba, VALID_PARTITIONS
from mvae_tpu.data.pipeline import ArrayDataset
from mvae_tpu.image.transforms import load_watermark, landmark_mask

N_MODALITIES = 6


def synthetic_landmarks(h=64, w=64, seed=0):
    """Deterministic plausible 68-point face layout (jittered template)."""
    rng = np.random.default_rng(seed)
    pts = np.zeros((68, 2), np.float32)
    # jaw 0..16: half-ellipse
    t = np.linspace(np.pi, 2 * np.pi, 17)
    pts[0:17, 0] = w / 2 + (w * 0.38) * np.cos(t)
    pts[0:17, 1] = h * 0.45 - (h * 0.42) * np.sin(t)
    # brows 17..26
    for i, x in enumerate(np.linspace(w * 0.25, w * 0.42, 5)):
        pts[17 + i] = (x, h * 0.33)
    for i, x in enumerate(np.linspace(w * 0.58, w * 0.75, 5)):
        pts[22 + i] = (x, h * 0.33)
    # nose 27..35
    for i, y in enumerate(np.linspace(h * 0.38, h * 0.58, 4)):
        pts[27 + i] = (w * 0.5, y)
    for i, x in enumerate(np.linspace(w * 0.44, w * 0.56, 5)):
        pts[31 + i] = (x, h * 0.60)
    # eyes 36..47
    for i, a in enumerate(np.linspace(0, 2 * np.pi, 6, endpoint=False)):
        pts[36 + i] = (w * 0.35 + w * 0.06 * np.cos(a),
                       h * 0.40 + h * 0.03 * np.sin(a))
        pts[42 + i] = (w * 0.65 + w * 0.06 * np.cos(a),
                       h * 0.40 + h * 0.03 * np.sin(a))
    # mouth 48..67
    for i, a in enumerate(np.linspace(0, 2 * np.pi, 20, endpoint=False)):
        pts[48 + i] = (w * 0.5 + w * 0.12 * np.cos(a),
                       h * 0.72 + h * 0.05 * np.sin(a))
    pts += rng.normal(0, 0.8, pts.shape).astype(np.float32)
    return pts


def derive_modalities(rgb: np.ndarray, *, masks: np.ndarray = None,
                      seed: int = 0, data_dir: str = None,
                      canny_mode: str = "absolute") -> dict:
    """rgb: (N, 64, 64, 3) float32 [0,1] -> dict of all six modalities.
    Gray/edge/obscure/watermark run as jitted jax kernels on the default
    device; the landmark mask rasterizes on host (or uses precomputed).

    canny_mode="absolute" (default) is skimage.feature.canny's threshold
    semantics — what the reference's offline edge stage produced
    (vision/setup.py:72,161), so on-device derivation agrees with any
    reference-precomputed edge dir. "relative" self-scales per image
    (image/transforms.py:canny_edges)."""
    import jax
    import jax.numpy as jnp
    from mvae_tpu.image import transforms as T

    n, h, w, _ = rgb.shape
    # user-supplied <data_dir>/watermark.png reproduces the reference's
    # asset exactly; procedural fallback otherwise (image/transforms.py)
    wm = jnp.asarray(load_watermark(h, w, data_dir=data_dir))

    @jax.jit
    def derive(x):
        return {
            "gray": T.rgb_to_grayscale(x),
            "edge": T.canny_edges(x, threshold_mode=canny_mode),
            "obscured": T.obscure(x),
            "watermark": T.alpha_composite(x, wm),
        }

    out = {k: np.asarray(v) for k, v in derive(jnp.asarray(rgb)).items()}
    out["image"] = rgb
    if masks is not None:
        out["mask"] = masks
    else:
        rng = np.random.default_rng(seed)
        mask = np.empty((n, h, w, 1), np.float32)
        for i in range(n):
            # ~5% white-canvas fallbacks, mirroring failed detections
            lms = None if rng.random() < 0.05 else synthetic_landmarks(
                h, w, seed=int(rng.integers(1 << 31)))
            mask[i] = landmark_mask(h, w, lms)
        # reference inverts: background black, lines white (:87)
        out["mask"] = 1.0 - mask
    return out


def _load_precomputed_masks(data_dir, paths):
    """Read img_align_celeba_mask/<path> when the offline setup ran."""
    from PIL import Image
    from mvae_tpu.data.celeba import _resize_center_crop_64
    mask_dir = os.path.join(data_dir, 'img_align_celeba_mask')
    if not os.path.isdir(mask_dir):
        return None
    out = np.empty((len(paths), 64, 64, 1), np.float32)
    for i, p in enumerate(paths):
        im = Image.open(os.path.join(mask_dir, p)).convert('L')
        out[i] = np.asarray(_resize_center_crop_64(im),
                            np.float32)[..., None] / 255.0
    return 1.0 - out      # invert (vision/datasets.py:87)


def load_celeb_vision(data_dir='./data', partition='train', *,
                      synthetic_ok=True, max_examples=None,
                      exact_decode=False, download=False):
    base = load_celeba(data_dir, partition, synthetic_ok=synthetic_ok,
                       max_examples=max_examples, exact_decode=exact_decode,
                       download=download)
    rgb = base.arrays["image"]
    masks = None
    eval_file = os.path.join(data_dir, 'Eval/list_eval_partition.txt')
    if os.path.isfile(eval_file):
        from mvae_tpu.data.celeba import load_eval_partition
        paths = load_eval_partition(partition, data_dir)
        if max_examples:
            paths = paths[:max_examples]
        masks = _load_precomputed_masks(data_dir, paths)
    mods = derive_modalities(rgb, masks=masks,
                             seed=VALID_PARTITIONS[partition],
                             data_dir=data_dir)
    return ArrayDataset(mods)
