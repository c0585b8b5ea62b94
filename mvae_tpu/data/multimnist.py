"""MultiMNIST dataset: 0-4 MNIST digits composited on a 50x50 canvas.

Behavioral spec from /root/reference/multimnist/datasets.py:107-342:
  * per example, draw k ~ U{min_digits..max_digits} digits (default 0..4);
  * each digit is the 28x28 source SHRUNK via imresize(digit, 1/s) with
    s ~ N(1.3, 0.1) (:112-113) — output side int(28/s) ~= 21-22 px
    (scipy.misc.imresize truncates the fractional size) — and placed at a
    random offset in [0, 50-side-1] per axis (:120-122, randint excludes
    the upper bound) or centered when translation is off;
  * digits are SUMMED onto the canvas; if any final pixel exceeds 255 the
    WHOLE canvas is rejected and redrawn — digit identities, scales and
    positions are all resampled (:141-146); no clipping fallback exists,
    and labels are only ever recorded for accepted canvases;
  * fixed-position variant uses pads [(4,4),(4,23),(23,4),(23,23)] at fixed
    scale 1.3 (side 21); `reverse` flips the LABEL string with prob 0.5,
    `scramble` shuffles the LABEL string, `no_repeat` resamples a digit
    until its label is unseen on this canvas (:220-250);
  * deterministic generation: np.random.seed(681307) (:187,:273);
  * 60k train / 10k test, saved to disk; label is the digit string.

The reference used scipy.misc.imresize (removed from scipy); we implement
bilinear resize in numpy. Generated shards cache to
<root>/multimnist/{training,test}.npz.
"""

import os

import numpy as np

from mvae_tpu.data.pipeline import ArrayDataset
from mvae_tpu.data.text import encode_digit_list, MAX_LENGTH

SEED = 681307
FIXED_PADS = [(4, 4), (4, 23), (23, 4), (23, 23)]
CANVAS = 50


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Minimal bilinear resize (align_corners=False convention)."""
    in_h, in_w = img.shape
    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def resized_side(s: float) -> int:
    """scipy.misc.imresize(img, 1/s) output side: int truncation of 28/s
    (multimnist/datasets.py:112-113). Clamped to the canvas for the
    vanishing tail of the scale distribution (the reference would crash
    there; s is ~8 sigma from any value that hits the clamp)."""
    if s <= 0:
        return 1
    return int(np.clip(int(28.0 / s), 1, CANVAS))


def _sample_one(digits_pool, labels_pool, rng, *, resize, translate):
    """One shrunken digit positioned on a zero canvas
    (multimnist/datasets.py:107-129)."""
    i = int(rng.integers(0, len(digits_pool)))
    d = digits_pool[i].astype(np.float32)
    if resize:
        s = 0.1 * rng.normal() + 1.3
        side = resized_side(s)
        d = bilinear_resize(d, side, side)
    h = d.shape[0]
    padding = CANVAS - h
    if translate and padding > 0:
        # randint(0, padding) EXCLUDES padding (:120-122)
        top = int(rng.integers(0, padding))
        left = int(rng.integers(0, padding))
    else:
        top = left = padding // 2
    return d, top, left, int(labels_pool[i])


def sample_multi(digits_pool, labels_pool, k, rng, *, resize, translate,
                 max_tries=10000):
    """Compose k digits; reject and FULLY redraw (identities included) any
    canvas whose summed max exceeds 255 (multimnist/datasets.py:141-146).
    The reference retries unboundedly (recursively); max_tries only guards
    pathological configs (e.g. --no-translate with k >= 2 digits, where the
    reference would hit RecursionError)."""
    for _ in range(max_tries):
        canvas = np.zeros((CANVAS, CANVAS), np.float32)
        labels = []
        for _ in range(k):
            d, top, left, lab = _sample_one(
                digits_pool, labels_pool, rng,
                resize=resize, translate=translate)
            h, w = d.shape
            canvas[top:top + h, left:left + w] += d
            labels.append(lab)
        if canvas.max() <= 255.0:
            return canvas, labels
    raise RuntimeError(
        f"multimnist: no non-overlapping canvas with k={k} digits after "
        f"{max_tries} tries (the reference recurses forever here)")


def sample_multi_fixed(digits_pool, labels_pool, k, rng, *, resize,
                       scramble, reverse, no_repeat, max_tries=10000):
    """Fixed-pad variant (multimnist/datasets.py:220-250): digits at fixed
    scale 1.3 on pads in slot order; reverse flips the LABEL string with
    prob 0.5, scramble shuffles the LABEL string, no_repeat redraws a digit
    until its label is new; summed canvas with the same >255 rejection."""
    del resize  # the reference always resizes in fixed mode (scale=1.3)
    side = resized_side(1.3)
    for _ in range(max_tries):
        canvas = np.zeros((CANVAS, CANVAS), np.float32)
        labels = []
        for slot in range(k):
            while True:
                i = int(rng.integers(0, len(digits_pool)))
                lab = int(labels_pool[i])
                if not (no_repeat and lab in labels):
                    break
            d = bilinear_resize(digits_pool[i].astype(np.float32),
                                side, side)
            top, left = FIXED_PADS[slot]
            canvas[top:top + side, left:left + side] += d
            labels.append(lab)
        if reverse and rng.random() > 0.5:
            labels = labels[::-1]
        if scramble:
            rng.shuffle(labels)
        if canvas.max() <= 255.0:
            return canvas, labels
    raise RuntimeError(
        f"multimnist fixed: no non-overlapping canvas with k={k} digits "
        f"after {max_tries} tries")


def mk_dataset(n, digits_pool, labels_pool, rng, *, min_digits=0,
               max_digits=4, resize=True, translate=True, fixed=False,
               scramble=False, reverse=False, no_repeat=False):
    images = np.zeros((n, CANVAS, CANVAS), np.uint8)
    texts = np.zeros((n, MAX_LENGTH), np.int32)
    for i in range(n):
        k = int(rng.integers(min_digits, max_digits + 1))
        if fixed:
            canvas, labels = sample_multi_fixed(
                digits_pool, labels_pool, k, rng, resize=resize,
                scramble=scramble, reverse=reverse, no_repeat=no_repeat)
        else:
            canvas, labels = sample_multi(
                digits_pool, labels_pool, k, rng, resize=resize,
                translate=translate)
        # acceptance guarantees max <= 255 — no clipping ever happens
        images[i] = canvas.astype(np.uint8)
        texts[i] = encode_digit_list(labels)
    return images, texts


def make_dataset(root="./data", *, n_train=60000, n_test=10000,
                 use_native=None, **opts):
    """Generate and cache both splits (reference entry:
    multimnist/datasets.py:293-342, seed at :187/:273).

    The default random path runs through the native C++ compositor
    (native/mvae_native.cc) when it builds — ~2 orders of magnitude faster
    than the Python loop for the 60k/10k canonical sizes. The numpy path
    remains the reference implementation and serves the fixed/scramble
    variants. Both are deterministic; they use different (documented) RNGs.
    """
    from mvae_tpu.data.mnist import load_mnist
    out_dir = os.path.join(root, "multimnist")
    os.makedirs(out_dir, exist_ok=True)
    native_ok = False
    if not opts.get("fixed") and use_native is not False:
        from mvae_tpu.data import native
        native_ok = native.available()
    for split, n in (("training", n_train), ("test", n_test)):
        src = load_mnist(root, train=(split == "training"), flatten=False)
        digits = (src.arrays["image"].reshape(-1, 28, 28) * 255.0)
        labels = src.arrays["text"]
        if native_ok:
            from mvae_tpu.data import native
            images, texts = native.multimnist_generate(
                digits.astype(np.uint8), labels, n,
                min_digits=opts.get("min_digits", 0),
                max_digits=opts.get("max_digits", 4),
                resize=opts.get("resize", True),
                translate=opts.get("translate", True), seed=SEED)
        else:
            rng = np.random.default_rng(SEED)
            images, texts = mk_dataset(n, digits, labels, rng, **opts)
        np.savez_compressed(os.path.join(out_dir, f"{split}.npz"),
                            images=images, texts=texts)
    return out_dir


def load_multimnist(root="./data", train=True, *, generate_n=None,
                    download=False):
    """Load cached shards; auto-generate a small set if absent.

    download=True fetches the source MNIST archives first (the generator
    composites real digits when they exist — reference flow:
    multimnist/datasets.py builds from torchvision-downloaded MNIST)."""
    split = "training" if train else "test"
    path = os.path.join(root, "multimnist", f"{split}.npz")
    if download and not os.path.exists(path):
        from mvae_tpu.data.download import download_idx, DownloadError
        try:
            download_idx(root, "MNIST")
        except (DownloadError, OSError) as e:
            print(f"[mvae_tpu] --download failed ({e}); generating from "
                  "local/synthetic MNIST instead")
    if not os.path.exists(path):
        n_train = generate_n or 2000
        print(f"[mvae_tpu.data] MultiMNIST: no shards at {path!r} — "
              f"generating {n_train} train examples now (run "
              f"experiments/multimnist/datasets.py for the full set)")
        make_dataset(root, n_train=n_train, n_test=max(n_train // 5, 200))
    with np.load(path) as z:
        images = z["images"].astype(np.float32)[..., None] / 255.0
        texts = z["texts"].astype(np.int32)
    return ArrayDataset({"image": images, "text": texts})
