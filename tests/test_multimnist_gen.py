"""MultiMNIST generator distribution parity.

Reference semantics (/root/reference/multimnist/datasets.py:107-159):
digits SHRINK to side int(28/s) with s ~ N(1.3, 0.1) (~21-22 px, NOT 36),
a canvas whose summed max exceeds 255 is fully redrawn (no clipping
fallback), and labels exist only for digits actually placed on an accepted
canvas. Both the numpy and the native C++ paths are checked.
"""

import numpy as np
import pytest

from mvae_tpu.data import native
from mvae_tpu.data.multimnist import (
    CANVAS, FIXED_PADS, resized_side, sample_multi, sample_multi_fixed)


def _flat_pool(value, n=10):
    """Constant-valued 28x28 tiles: bilinear resize of a constant is exactly
    constant, so the ink bounding box equals the resized tile side."""
    digits = np.full((n, 28, 28), float(value), np.float32)
    labels = np.arange(n) % 10
    return digits, labels


def _bbox_side(canvas):
    ys, xs = np.nonzero(canvas)
    return max(ys.max() - ys.min() + 1, xs.max() - xs.min() + 1)


def test_resized_side_matches_imresize_semantics():
    # int truncation of 28/s (scipy.misc.imresize with a float argument)
    assert resized_side(1.3) == int(28 / 1.3) == 21
    assert resized_side(1.0) == 28
    assert resized_side(1.4) == 20
    # clamps on the pathological tails the reference would crash on
    assert resized_side(-0.5) == 1
    assert resized_side(0.1) == CANVAS


def test_digits_shrink_mean_bbox_20_to_24():
    digits, labels = _flat_pool(100)
    rng = np.random.default_rng(0)
    sides = []
    for _ in range(300):
        canvas, labs = sample_multi(digits, labels, 1, rng,
                                    resize=True, translate=True)
        assert len(labs) == 1
        sides.append(_bbox_side(canvas))
    mean = np.mean(sides)
    assert 20 <= mean <= 24, f"digit scale inverted? mean side {mean}"
    # enlarged digits need s < 0.93 (~3.7 sigma): a rare tail, not the norm
    assert np.mean(np.asarray(sides) >= 28) <= 0.01


def test_overlap_rejection_no_clip_artifacts():
    # value-150 tiles: ANY overlap sums to 300 > 255 => must be redrawn, so
    # accepted canvases contain only non-overlapping tiles and no pixel was
    # ever clipped
    digits, labels = _flat_pool(150)
    rng = np.random.default_rng(1)
    for _ in range(100):
        k = int(rng.integers(0, 3))
        canvas, labs = sample_multi(digits, labels, k, rng,
                                    resize=True, translate=True)
        assert canvas.max() <= 150.0
        assert len(labs) == k
        if k:
            # labels exist only for placed digits: union ink area == sum of
            # per-digit tile areas (sides ~17..28 at 3 sigma => area/k in [250, 800];
            # the old inverted-scale bug gave ~1296)
            area = np.count_nonzero(canvas)
            assert 250 <= area / k <= 800
        else:
            assert canvas.max() == 0


def test_placement_offsets_exclude_upper_bound():
    # randint(0, padding) EXCLUDES padding: a digit of side h never starts
    # at row/col CANVAS - h, so its last row/col never touches index 49...
    # unless h itself reaches the canvas edge (impossible at these scales)
    digits, labels = _flat_pool(100)
    rng = np.random.default_rng(2)
    touched_49 = 0
    for _ in range(200):
        canvas, _ = sample_multi(digits, labels, 1, rng,
                                 resize=True, translate=True)
        ys, xs = np.nonzero(canvas)
        h = _bbox_side(canvas)
        if ys.max() == CANVAS - 1 or xs.max() == CANVAS - 1:
            touched_49 += 1
    assert touched_49 == 0


def test_fixed_variant_semantics():
    # value 60: the four fixed tiles quadruple-overlap in a 2x2 center
    # block, so anything over 255/4 would be rejected forever
    digits, labels = _flat_pool(60)
    rng = np.random.default_rng(3)
    side = resized_side(1.3)
    canvas, labs = sample_multi_fixed(digits, labels, 4, rng, resize=True,
                                      scramble=False, reverse=False,
                                      no_repeat=True)
    assert len(labs) == 4 and len(set(labs)) == 4   # no_repeat: unique
    for top, left in FIXED_PADS:
        assert canvas[top + side // 2, left + side // 2] > 0  # ink at pad
    # reverse is a COIN FLIP on the label string (datasets.py:240-241)
    rng = np.random.default_rng(4)
    flips = set()
    for _ in range(30):
        _, labs = sample_multi_fixed(digits, labels, 2, rng, resize=True,
                                     scramble=False, reverse=True,
                                     no_repeat=True)
        flips.add(tuple(labs))
    assert len(flips) > 1   # both orders occur across draws


@pytest.mark.skipif(not native.available(),
                    reason="native lib unavailable (no g++?)")
def test_native_generator_matches_distribution():
    digits, labels = _flat_pool(150)
    imgs, txts = native.multimnist_generate(
        (digits).astype(np.uint8), labels.astype(np.int32), 300,
        min_digits=1, max_digits=2, seed=7)
    sides = []
    for img, txt in zip(imgs, txts):
        k = int((txt != 11).sum())
        assert img.max() <= 150          # no clipped overlaps survive
        area = np.count_nonzero(img)
        assert 250 <= area / k <= 800    # labels only for placed digits
        if k == 1:
            sides.append(_bbox_side(img))
    assert sides and 20 <= np.mean(sides) <= 24
