"""Explicit-collective data parallelism via shard_map.

The GSPMD path (jit + NamedSharding, parallel/mesh.py) is the default: XLA
derives the gradient psums automatically and BatchNorm's batch statistics
stay GLOBAL because the compiler sees the full-batch reductions.

This module is the explicit alternative — per-shard forward/backward with a
hand-placed `jax.lax.pmean` over the "data" axis — useful when you want
control over where the collective happens (e.g. to overlap it, or to keep
per-shard BN statistics on purpose). Semantics note: BN batch statistics
here are PER-SHARD (each device normalizes its slice); models without BN
(mnist) are bitwise-equivalent to single-device in eval. This is documented
behavior, not a bug — large-scale training commonly uses per-replica BN.
"""

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from mvae_tpu.core.engine import multi_term_elbo


def make_shardmap_train_step(model, tx, term_masks, term_lambdas, mesh):
    """Step over a batch sharded on mesh axis "data"; grads pmean'd across
    shards before the (replicated) optimizer update."""
    masks = jnp.asarray(term_masks, jnp.float32)
    lambdas = jnp.asarray(term_lambdas, jnp.float32)

    def shard_body(params, state, opt_state, rng, batch, beta):
        # decorrelate reparam noise across shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        rng, sub = jax.random.split(rng)

        def loss_fn(p):
            total, _, new_state = multi_term_elbo(
                model, p, state, batch, masks, lambdas, sub, beta,
                train=True)
            return total, new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        # per-shard BN stats -> average them so replicas stay identical
        new_state = jax.lax.pmean(new_state, "data")
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, loss

    mapped = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("data"), P()),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(mapped)


def make_shardmap_eval_step(model, term_masks, term_lambdas, mesh):
    masks = jnp.asarray(term_masks, jnp.float32)
    lambdas = jnp.asarray(term_lambdas, jnp.float32)

    def shard_body(params, state, batch):
        total, _, _ = multi_term_elbo(model, params, state, batch, masks,
                                      lambdas, None, jnp.float32(1.0),
                                      train=False)
        return jax.lax.pmean(total, "data")

    mapped = shard_map(shard_body, mesh=mesh,
                       in_specs=(P(), P(), P("data")), out_specs=P())
    return jax.jit(mapped)
