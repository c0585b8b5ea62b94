"""Jitted train/eval steps and the epoch driver utilities.

One optimizer step = one XLA program (all ELBO subset terms batched — see
core/engine.py). Equivalent reference flow: mnist/train.py:174-268.
"""

import functools

import jax
import jax.numpy as jnp
import optax

from mvae_tpu.core.engine import multi_term_elbo


def make_train_step(model, tx, term_masks, term_lambdas, *,
                    dynamic_masks: bool = False):
    """Build the jitted training step.

    term_masks/term_lambdas: (T, M) arrays. With dynamic_masks=True the step
    takes (masks, lambdas) as runtime arguments instead (celeba19's sampled
    subset terms change every step — celeba19/train.py:286-302).

    Step signature:
        (params, state, opt_state, rng, batch, beta[, masks, lambdas])
        -> (params, state, opt_state, rng, loss, per_term)
    """
    static_masks = None if dynamic_masks else jnp.asarray(term_masks, jnp.float32)
    static_lambdas = None if dynamic_masks else jnp.asarray(term_lambdas, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, rng, batch, beta,
                   masks=static_masks, lambdas=static_lambdas):
        rng, sub = jax.random.split(rng)

        def loss_fn(p):
            total, aux, new_state = multi_term_elbo(
                model, p, state, batch, masks, lambdas, sub, beta, train=True)
            return total, (aux, new_state)

        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, rng, loss, aux["per_term"]

    return train_step


def make_eval_step(model, term_masks, term_lambdas):
    """Eval: beta=1, no reparam noise (z = mu), running BN stats, no dropout
    (reference test(): mnist/train.py:229-253)."""
    masks = jnp.asarray(term_masks, jnp.float32)
    lambdas = jnp.asarray(term_lambdas, jnp.float32)

    @jax.jit
    def eval_step(params, state, batch):
        total, aux, _ = multi_term_elbo(
            model, params, state, batch, masks, lambdas, None,
            jnp.float32(1.0), train=False)
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
