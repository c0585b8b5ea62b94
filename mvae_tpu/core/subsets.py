"""ELBO-term subset sampling for celeba19 (the "approx-m" machinery).

Reference flow (/root/reference/celeba19/train.py:87-142,286-302):
enumerate ALL modality subsets of size 2..n-1 over n=19 (a ~520k-row boolean
pool rebuilt-scanned with numpy EVERY STEP), then per step draw `m` subsets
STRATIFIED BY SIZE: first a size s ~ Uniform{2..n-1} (every size class is
non-empty so bincount>0 keeps all), then a uniform combination of that size.

Equivalent direct sampler (no 2^19 pool materialization): draw the m sizes
s ~ U{2..n-1} WITH replacement (np.random.choice(pool_space, size,
replace=True), :126), then within each size class draw that many DISTINCT
uniform s-subsets (np.random.choice(range(pool_i), sample_dist[s],
replace=False), :133-138 — no replacement within a class). Rejection
sampling of distinct subsets is distribution-identical to choosing
without replacement from the full enumeration; cost is O(m*n) per step
instead of O(2^n) memory. Like the reference, the emitted rows are grouped
by size ascending.

The per-step masks feed the jitted multi-term step as a runtime array —
one compiled graph serves every subset choice.
"""

import math

import numpy as np


def sample_subset_masks(rng: np.random.Generator, m: int, n: int = 19
                        ) -> np.ndarray:
    """(m, n) 0/1 masks; sizes stratified-uniform over 2..n-1 (with
    replacement), subsets distinct WITHIN each size class (the reference's
    per-class replace=False, celeba19/train.py:133-138)."""
    sizes = rng.integers(2, n, size=m)         # 2..n-1 inclusive
    masks = np.zeros((m, n), np.float32)
    row = 0
    for s in sorted(set(int(v) for v in sizes)):
        count = int(np.sum(sizes == s))
        if count > math.comb(n, s):
            # the reference's np.random.choice(..., replace=False) raises
            # here too; unreachable for n=19 at any sane approx_m
            raise ValueError(
                f"cannot draw {count} distinct subsets of size {s} from "
                f"{n} modalities")
        seen = []
        while len(seen) < count:
            idx = tuple(sorted(rng.choice(n, size=s, replace=False)))
            if idx not in seen:
                seen.append(idx)
        for combo in seen:
            masks[row, list(combo)] = 1.0
            row += 1
    return masks


def celeba19_static_terms(n_attrs: int, lambda_image: float,
                          lambda_attrs: float):
    """The 20 fixed terms (celeba19/train.py:263-283): complete (args
    lambdas), image-only (args lambdas), 18 single-attribute terms (DEFAULT
    lambdas 1.0 — the reference calls elbo_loss without lambda kwargs there).
    Returns (masks (20, 1+n), lambdas (20, 1+n))."""
    n = 1 + n_attrs
    masks = np.zeros((2 + n_attrs, n), np.float32)
    lambdas = np.ones_like(masks)
    masks[0, :] = 1.0                  # complete
    lambdas[0, 0] = lambda_image
    lambdas[0, 1:] = lambda_attrs
    masks[1, 0] = 1.0                  # image only
    lambdas[1, 0] = lambda_image
    lambdas[1, 1:] = lambda_attrs
    for i in range(n_attrs):           # single-attribute terms, lambdas 1.0
        masks[2 + i, 1 + i] = 1.0
    return masks, lambdas


def celeba19_recon_support(m: int, n_attrs: int = 18) -> np.ndarray:
    """STATIC (20+m, 19) upper bound of the per-term recon weights for the
    engine's dead-backward elimination (core/engine.py:_decode_grouped):
    the fixed terms' pattern is trace-time knowledge — complete (all),
    image-only, 18 single-attribute — while the m runtime-sampled subset
    terms are conservatively all-ones."""
    n = 1 + n_attrs
    sup = np.zeros((2 + n_attrs + m, n), np.float32)
    sup[0] = 1.0
    sup[1, 0] = 1.0
    for i in range(n_attrs):
        sup[2 + i, 1 + i] = 1.0
    sup[2 + n_attrs:] = 1.0
    return sup


def celeba19_step_terms(rng, m: int, n_attrs: int, lambda_image: float,
                        lambda_attrs: float):
    """Full per-step (20+m, 19+... ) masks/lambdas: static terms + m sampled
    subset terms (sampled terms use default lambdas 1.0,
    celeba19/train.py:294-300). Invariant: (n_attrs+1) + 1 + m terms
    (celeba19/train.py:304)."""
    static_m, static_l = celeba19_static_terms(n_attrs, lambda_image,
                                               lambda_attrs)
    if m <= 0:
        return static_m, static_l
    samp = sample_subset_masks(rng, m, 1 + n_attrs)
    masks = np.concatenate([static_m, samp])
    lambdas = np.concatenate([static_l, np.ones_like(samp)])
    assert masks.shape[0] == (n_attrs + 1) + 1 + m
    return masks, lambdas
