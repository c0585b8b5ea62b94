"""BatchNorm with explicit running-stats state (torch semantics).

torch BatchNorm{1,2}d: normalize with biased batch variance; running stats
updated with momentum=0.1 using the UNBIASED batch variance; eps=1e-5.
Used by the fashionmnist/multimnist/celeba/vision nets
(e.g. /root/reference/celeba/model.py:80-87).

State is a dict {"mean": (C,), "var": (C,)}. In train mode the apply returns
the EMA-updated state; in eval mode it normalizes with the running stats.

When a decoder is vmapped over the ELBO-term axis, batch statistics are
computed per-term (matching the reference's one-forward-per-term behavior);
the caller averages the per-term new states before committing the EMA update.
"""

import os

import jax.numpy as jnp

# torch default momentum; the engine's exact sequential-EMA composition
# (core/engine.py:commit_ema_states) assumes every BN in the framework
# uses this value
BN_MOMENTUM = 0.1

# Batch-moment algorithm. "one_pass" computes var = E[x^2] - E[x]^2 so XLA
# fuses BOTH channel reductions into a single read of the activation;
# "two_pass" is the textbook mean(square(x - mean)) (what eager torch CPU
# computes), costing one extra full pass over every BN input per step.
# The forms are algebraically identical (and share one backward formula);
# numerically they differ at the f32 rounding floor — the golden-parity
# suite passes under BOTH (tests/test_nn_torch_parity.py,
# tests/test_golden_parity_conv.py). one_pass ships as the default on
# traffic accounting; the hardware A/B matrix is scripts/bn_perf_matrix.py
# (BASELINE.md records its status). Read lazily so MVAE_BN_TWO_PASS=1
# applies at trace time, not import time.


def _one_pass_default() -> bool:
    return os.environ.get("MVAE_BN_TWO_PASS") != "1"


# MVAE_BN_MXU_MOMENTS=1 (opt-in experiment): compute the two forward batch
# moments as ones-vector matmuls, (1,N)@(N,C), so they lower onto the MXU
# instead of VPU channel reductions — the flagship trace puts ~48% of the
# CelebA step in BN/ELBO reduction work (BASELINE.md roofline section).
# Forward-only: the BN backward's channel sums are the transposes of the
# (x - mean) broadcasts and stay VPU reductions regardless of the forward
# form. Algebraically identical to the fused one-pass reductions; numerics
# differ only in f32 accumulation order.


def _mxu_moments() -> bool:
    return os.environ.get("MVAE_BN_MXU_MOMENTS") == "1"


def batchnorm_init(c: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def batchnorm_apply(params, state, x, *, train: bool,
                    momentum: float = BN_MOMENTUM, eps: float = 1e-5,
                    one_pass: bool | None = None):
    """x: (..., C); normalizes over all leading axes."""
    if one_pass is None:
        one_pass = _one_pass_default()
    if train:
        axes = tuple(range(x.ndim - 1))
        n = 1
        for a in axes:
            n *= x.shape[a]
        if one_pass and _mxu_moments():
            x2d = x.reshape(n, x.shape[-1]).astype(jnp.float32)
            ones = jnp.ones((n,), jnp.float32)
            mean = (ones @ x2d) / n
            # the square fuses into the second matmul's operand read
            var = jnp.maximum((ones @ jnp.square(x2d)) / n
                              - jnp.square(mean), 0.0)
            # keep downstream dtypes identical to the reduction path
            mean, var = mean.astype(x.dtype), var.astype(x.dtype)
        elif one_pass:
            mean = jnp.mean(x, axis=axes)
            # single read: both reductions fuse over the same pass of x;
            # clamp the cancellation residue (var >= 0 analytically)
            var = jnp.maximum(
                jnp.mean(jnp.square(x), axis=axes) - jnp.square(mean), 0.0)
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean), axis=axes)  # biased
        # unbiased variance feeds the running estimate (torch behavior)
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y, new_state


def batchnorm_swish_from_moments(params, state, x, s, q, *,
                                 momentum: float = BN_MOMENTUM,
                                 eps: float = 1e-5, out_dtype=None):
    """Train-mode BN+swish when the batch moment SUMS arrived with x (the
    fused conv epilogue, ops/convbn_pallas.py): s = sum(x), q = sum(x*x)
    per channel, f32. Identical EMA/normalize semantics to the one-pass
    branch of batchnorm_apply — the reduction is just already done."""
    from mvae_tpu.nn.layers import swish
    if out_dtype is None:
        out_dtype = x.dtype
    n = x.size // x.shape[-1]
    mean = s / n
    var = jnp.maximum(q / n - mean * mean, 0.0)
    unbiased = var * (n / max(n - 1, 1))
    new_state = {
        "mean": (1 - momentum) * state["mean"] + momentum * mean,
        "var": (1 - momentum) * state["var"] + momentum * unbiased,
    }
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    a = inv * params["scale"]
    y = x.astype(jnp.float32) * a + (params["bias"] - mean * a)
    return swish(y.astype(out_dtype)), new_state


def batchnorm_swish_apply(params, state, x, *, train: bool,
                          momentum: float = BN_MOMENTUM, eps: float = 1e-5,
                          out_dtype=None):
    """BN followed by swish — the universal pairing in the reference nets
    (every BatchNorm there feeds a Swish, e.g. celeba/model.py:80-91).

    x may be in the compute dtype (bf16); BN math runs in f32 and the
    result is returned in out_dtype (default: x's dtype). With
    MVAE_PALLAS_BN=1 the train-mode path runs the fused Pallas kernel
    (ops/bn_pallas.py) — one read for both moments, normalize+swish in a
    second, no materialized intermediates; EMA semantics identical.
    """
    from mvae_tpu.nn.layers import swish
    if out_dtype is None:
        out_dtype = x.dtype
    if train:
        from mvae_tpu.ops.bn_pallas import bn_swish_train, use_pallas_bn
        # the kernel hard-codes one-pass moments: the MVAE_BN_TWO_PASS
        # escape hatch must win over MVAE_PALLAS_BN when both are set
        if use_pallas_bn() and _one_pass_default():
            y, mean, var = bn_swish_train(x, params["scale"], params["bias"],
                                          eps)
            n = x.size // x.shape[-1]
            unbiased = var * (n / max(n - 1, 1))
            new_state = {
                "mean": (1 - momentum) * state["mean"] + momentum * mean,
                "var": (1 - momentum) * state["var"] + momentum * unbiased,
            }
            return y.astype(out_dtype), new_state
    y, new_state = batchnorm_apply(params, state, x.astype(jnp.float32),
                                   train=train, momentum=momentum, eps=eps)
    return swish(y.astype(out_dtype)), new_state
