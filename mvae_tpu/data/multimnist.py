"""MultiMNIST dataset: 0-4 MNIST digits composited on a 50x50 canvas.

Behavioral spec from /root/reference/multimnist/datasets.py:107-342:
  * per example, draw k ~ U{min_digits..max_digits} digits (default 0..4);
  * each digit is the 28x28 source rescaled by s ~ N(1.3, 0.1) (:119-124),
    placed at a random (or fixed) offset inside the 50x50 canvas;
  * digits are summed onto the canvas; if any pixel exceeds 255 the sample
    is REJECTED and redrawn (overlap rejection, :137-151);
  * fixed-position variant uses pads [(4,4),(4,23),(23,4),(23,23)] with
    options reverse / scramble / no-repeat (:207-290);
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


def _place(canvas, digit, rng, *, resize=True, translate=True, pad=None):
    """Add one digit; returns False on overlap (pixel > 255)."""
    d = digit.astype(np.float32)
    if resize:
        s = max(0.5, rng.normal(1.3, 0.1))
        hw = max(1, min(CANVAS, int(round(28 * s))))
        d = bilinear_resize(d, hw, hw)
    h, w = d.shape
    if pad is not None:
        top, left = pad
        top = min(top, CANVAS - h)
        left = min(left, CANVAS - w)
    elif translate:
        top = rng.integers(0, CANVAS - h + 1)
        left = rng.integers(0, CANVAS - w + 1)
    else:
        top = left = (CANVAS - h) // 2
    region = canvas[top:top + h, left:left + w]
    if np.any(region + d > 255.0):
        return False
    region += d
    return True


def sample_multi(digits_pool, labels_pool, k, rng, *, resize, translate,
                 max_tries=20):
    """Compose k digits with overlap rejection; returns (canvas, labels)."""
    for _ in range(max_tries):
        canvas = np.zeros((CANVAS, CANVAS), np.float32)
        chosen = rng.integers(0, len(digits_pool), size=k)
        ok = True
        for idx in chosen:
            if not _place(canvas, digits_pool[idx], rng,
                          resize=resize, translate=translate):
                ok = False
                break
        if ok:
            return canvas, [int(labels_pool[i]) for i in chosen]
    # give up on rejection: return the (possibly clipped) last attempt
    return np.clip(canvas, 0, 255), [int(labels_pool[i]) for i in chosen]


def sample_multi_fixed(digits_pool, labels_pool, k, rng, *, resize,
                       scramble, reverse, no_repeat):
    canvas = np.zeros((CANVAS, CANVAS), np.float32)
    if no_repeat:
        chosen = rng.choice(len(digits_pool), size=k, replace=False)
    else:
        chosen = rng.integers(0, len(digits_pool), size=k)
    pads = FIXED_PADS[:k]
    order = list(range(k))
    if reverse:
        order = order[::-1]
    if scramble:
        rng.shuffle(order)
    for slot, i in enumerate(order):
        d = digits_pool[chosen[i]].astype(np.float32)
        if resize:
            d = bilinear_resize(d, 23, 23)
        top, left = pads[slot]
        h, w = d.shape
        canvas[top:top + h, left:left + w] = np.maximum(
            canvas[top:top + h, left:left + w], d)
    return np.clip(canvas, 0, 255), [int(labels_pool[i]) for i in chosen]


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
        images[i] = np.clip(canvas, 0, 255).astype(np.uint8)
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


def load_multimnist(root="./data", train=True, *, generate_n=None):
    """Load cached shards; auto-generate a small set if absent."""
    split = "training" if train else "test"
    path = os.path.join(root, "multimnist", f"{split}.npz")
    if not os.path.exists(path):
        n_train = generate_n or 2000
        make_dataset(root, n_train=n_train, n_test=max(n_train // 5, 200))
    with np.load(path) as z:
        images = z["images"].astype(np.float32)[..., None] / 255.0
        texts = z["texts"].astype(np.int32)
    return ArrayDataset({"image": images, "text": texts})
