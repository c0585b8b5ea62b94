"""Jitted train/eval steps and the epoch driver utilities.

One optimizer step = one XLA program (all ELBO subset terms batched — see
core/engine.py). Equivalent reference flow: mnist/train.py:174-268.
"""

import functools

import jax
import jax.numpy as jnp
import optax

from mvae_tpu.core.engine import multi_term_elbo


def decode_batch(batch, dtype=jnp.float32):
    """Device-side input decode: uint8 image tensors stored in HBM become
    `dtype` in [0, 1] inside the compiled step (4x less HBM + no per-step
    host transfer); other dtypes pass through.

    dtype=bf16 halves the materialized decode write+read. Unlike
    MVAE_BF16_LOGITS this is NOT bit-identical: the decoded image feeds the
    loss as the BCE target, and x/255 rounds once in bf16 (targets shift by
    <= 1 bf16 ulp ~ 0.4% of a pixel value). Measured +5.4% on celeba and
    convergence-parity clean (celeba@bf16@dec gap 0.073% vs torch, TIGHTER
    than @bf16's 0.081%) — see BASELINE.md round-4 section."""
    return {k: (v.astype(dtype) / dtype(255.0) if v.dtype == jnp.uint8
                else v)
            for k, v in batch.items()}


def resolve_decode_dtype(model):
    """Step-BUILD-time choice of the in-step input-decode dtype.

    Default follows the model's compute dtype: bf16 compute (the shipped
    default on every family) decodes targets in bf16, --f32 keeps the
    exact-numerics promise with f32 decode. MVAE_DECODE_BF16=1/0 pins it
    either way (read when the step is BUILT, before jit tracing — flipping
    the env var after the step function exists has no effect, same caveat
    as MVAE_GROUPED_TERM_LOSS)."""
    import os
    import numpy as np
    env = os.environ.get("MVAE_DECODE_BF16")
    if env is not None:
        return jnp.bfloat16 if env == "1" else jnp.float32
    cd = getattr(model, "compute_dtype", None)
    # np.dtype-normalize so the string form 'bfloat16' (accepted by Flax
    # dtype params) resolves the same as the jnp type
    if cd is not None and np.dtype(cd) == np.dtype(jnp.bfloat16):
        return jnp.bfloat16
    return jnp.float32


def _static_support(term_masks, term_lambdas, recon_masks):
    """Trace-time (T, M) 0/1 support of the recon weights; lets the engine
    stop dead decoder backward paths (engine._decode_grouped)."""
    import numpy as np
    base = term_masks if recon_masks is None else recon_masks
    w = np.asarray(base, np.float64) * np.asarray(term_lambdas, np.float64)
    return (w != 0).astype(np.float32)


def make_train_step(model, tx, term_masks, term_lambdas, *,
                    dynamic_masks: bool = False, device_data: bool = False,
                    recon_masks=None, recon_support=None,
                    fast_skip_decode: bool = False,
                    grouped_term_loss=None):
    """Build the jitted training step.

    term_masks/term_lambdas: (T, M) arrays. With dynamic_masks=True the step
    takes (masks, lambdas) as runtime arguments instead (celeba19's sampled
    subset terms change every step — celeba19/train.py:286-302).
    recon_masks: optional (T, M) reconstruction mask decoupled from the
    posterior mask (vision; see core/engine.py:multi_term_elbo).
    grouped_term_loss: tri-state for the grouped term-loss fusion —
    True/False pin it; None (default) defers to MVAE_GROUPED_TERM_LOSS,
    which is read at step-BUILD time (engine.grouped_term_loss_default):
    flipping the env var after this function returns has no effect.

    device_data=True: the `batch` argument becomes (data, idx) where `data`
    is the FULL dataset resident on device and idx the (B,) batch indices —
    the gather happens inside the compiled step, so the only per-step
    host->device transfer is ~4*B bytes of indices. This is the TPU-native
    input pipeline for datasets that fit HBM.

    Step signature:
        (params, state, opt_state, rng, batch, beta[, masks, lambdas])
        -> (params, state, opt_state, rng, loss, per_term)
    """
    static_masks = None if dynamic_masks else jnp.asarray(term_masks, jnp.float32)
    static_lambdas = None if dynamic_masks else jnp.asarray(term_lambdas, jnp.float32)
    rmasks = None if recon_masks is None else jnp.asarray(recon_masks,
                                                          jnp.float32)
    if recon_support is None and not dynamic_masks:
        recon_support = _static_support(term_masks, term_lambdas,
                                        recon_masks)
    decode_dt = resolve_decode_dtype(model)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, rng, batch, beta,
                   masks=static_masks, lambdas=static_lambdas):
        rng, sub = jax.random.split(rng)
        if device_data:
            data, idx = batch
            batch_ = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
        else:
            batch_ = batch
        batch_ = decode_batch(batch_, decode_dt)

        def loss_fn(p):
            total, aux, new_state = multi_term_elbo(
                model, p, state, batch_, masks, lambdas, sub, beta,
                train=True, recon_masks=rmasks,
                recon_support=recon_support,
                fast_skip_decode=fast_skip_decode,
                grouped_term_loss=grouped_term_loss)
            return total, (aux, new_state)

        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, rng, loss, aux["per_term"]

    return train_step


def gather_local(data, idx):
    """Per-shard batched gather for the device-resident pipeline.

    data: dict name -> (D, n_loc, ...) — the dataset reshaped so its leading
    axis matches the mesh "data" axis (D=1 single-device). idx: (D, b) of
    LOCAL row indices. vmapping the gather over the leading axis makes it a
    batched gather whose batch dim is the sharded one, so GSPMD partitions
    it with NO cross-device collective — each chip gathers rows of its own
    resident shard. The (D, b) -> (D*b,) reshape keeps the batch sharded
    over "data" for the rest of the step.
    """
    out = {}
    for k, v in data.items():
        g = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))(v, idx)
        out[k] = g.reshape((-1,) + g.shape[2:])
    return out


def make_multi_train_step(model, tx, term_masks, term_lambdas, *,
                          dynamic_masks: bool = False, recon_masks=None,
                          recon_support=None,
                          fast_skip_decode: bool = False,
                          grouped_term_loss=None):
    """K training steps in ONE dispatch via lax.scan over the batch-index
    windows — the device-resident pipeline's outer loop.

    Motivation (measured on the tunneled v5e): a single fetch of a fresh
    device scalar costs ~40-90 ms, so per-step loss readback dominates the
    epoch (600 x 40 ms vs 600 x 5 ms of compute). Scanning K steps per
    dispatch returns ONE (K,) loss buffer — one fetch per logging window.

    Works under a GSPMD mesh: `data` arrives sharded NamedSharding(P("data"))
    on its leading (D,) axis, idx rows hold per-shard LOCAL indices, and the
    per-shard gather (gather_local) keeps every gather on-chip; XLA inserts
    only the gradient psums.

    Signature:
        (params, state, opt_state, rng, data {name: (D, n_loc, ...)},
         idxs (K, D, b), betas (K,) [, masks (K, T, M), lambdas (K, T, M)])
        -> (params, state, opt_state, rng, losses (K,))
    """
    static_masks = None if dynamic_masks else jnp.asarray(term_masks,
                                                          jnp.float32)
    static_lambdas = None if dynamic_masks else jnp.asarray(term_lambdas,
                                                            jnp.float32)
    rmasks = None if recon_masks is None else jnp.asarray(recon_masks,
                                                          jnp.float32)
    if recon_support is None and not dynamic_masks:
        recon_support = _static_support(term_masks, term_lambdas,
                                        recon_masks)
    decode_dt = resolve_decode_dtype(model)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def multi_step(params, state, opt_state, rng, data, idxs, betas,
                   masks=None, lambdas=None):
        def body(carry, xs):
            p, s, o, r = carry
            if dynamic_masks:
                idx, beta, m, lam = xs
            else:
                idx, beta = xs
                m, lam = static_masks, static_lambdas
            r, sub = jax.random.split(r)
            batch = decode_batch(gather_local(data, idx), decode_dt)

            def loss_fn(pp):
                total, aux, new_state = multi_term_elbo(
                    model, pp, s, batch, m, lam, sub, beta, train=True,
                    recon_masks=rmasks, recon_support=recon_support,
                    fast_skip_decode=fast_skip_decode,
                    grouped_term_loss=grouped_term_loss)
                return total, new_state

            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, new_o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), new_state, new_o, r), loss

        xs = ((idxs, betas, masks, lambdas) if dynamic_masks
              else (idxs, betas))
        (params, state, opt_state, rng), losses = jax.lax.scan(
            body, (params, state, opt_state, rng), xs)
        return params, state, opt_state, rng, losses

    return multi_step


def make_multi_eval_step(model, term_masks, term_lambdas, *,
                         recon_masks=None):
    """K eval batches in one dispatch -> (K,) losses (device-data path).
    data: {name: (D, n_loc, ...)}; idxs: (K, D, b) local indices."""
    masks = jnp.asarray(term_masks, jnp.float32)
    lambdas = jnp.asarray(term_lambdas, jnp.float32)
    rmasks = None if recon_masks is None else jnp.asarray(recon_masks,
                                                          jnp.float32)
    decode_dt = resolve_decode_dtype(model)

    @jax.jit
    def multi_eval(params, state, data, idxs):
        def body(_, idx):
            batch = decode_batch(gather_local(data, idx), decode_dt)
            total, aux, _ = multi_term_elbo(
                model, params, state, batch, masks, lambdas, None,
                jnp.float32(1.0), train=False, recon_masks=rmasks)
            return None, total
        _, losses = jax.lax.scan(body, None, idxs)
        return losses

    return multi_eval


def make_eval_step(model, term_masks, term_lambdas, *,
                   device_data: bool = False, recon_masks=None):
    """Eval: beta=1, no reparam noise (z = mu), running BN stats, no dropout
    (reference test(): mnist/train.py:229-253)."""
    masks = jnp.asarray(term_masks, jnp.float32)
    lambdas = jnp.asarray(term_lambdas, jnp.float32)
    rmasks = None if recon_masks is None else jnp.asarray(recon_masks,
                                                          jnp.float32)
    decode_dt = resolve_decode_dtype(model)

    @jax.jit
    def eval_step(params, state, batch):
        if device_data:
            data, idx = batch
            batch_ = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
        else:
            batch_ = batch
        batch_ = decode_batch(batch_, decode_dt)
        total, aux, _ = multi_term_elbo(
            model, params, state, batch_, masks, lambdas, None,
            jnp.float32(1.0), train=False, recon_masks=rmasks)
        return total, aux["per_term"]

    return eval_step


class AverageMeter:
    """Running mean for logging (mnist/train.py:97-112)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def log_train(epoch, batch_idx, batch_size, n_examples, n_batches, avg_loss,
              beta):
    """The reference's only observability surface — keep its format
    (mnist/train.py:221-224)."""
    print('Train Epoch: {} [{}/{} ({:.0f}%)]\tLoss: {:.6f}\t'
          'Annealing-Factor: {:.3f}'.format(
              epoch, batch_idx * batch_size, n_examples,
              100.0 * batch_idx / n_batches, avg_loss, beta))


def log_epoch(epoch, avg_loss):
    print('====> Epoch: {}\tLoss: {:.4f}'.format(epoch, avg_loss))


def log_test(avg_loss):
    print('====> Test Loss: {:.4f}'.format(avg_loss))
