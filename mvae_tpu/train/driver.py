"""Generic epoch driver shared by all six experiments.

The reference duplicates this loop six times (mnist/train.py:174-268 etc.);
here each experiment supplies (model, datasets, term masks/lambdas, argparse
namespace) and the driver does: KL-annealed jitted steps, running-average
logging in the reference's format, per-epoch eval, dual-file checkpointing,
and resume (params+opt+step+rng — the reference saved optimizer state but
could not resume; SURVEY.md §5).

Multi-device: if more than one device is visible, batches shard over a
"data" mesh axis and XLA inserts the gradient collectives (GSPMD). Semantics
are identical to single-device (tested on the virtual 8-CPU mesh).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvae_tpu.core.anneal import annealing_factor
from mvae_tpu.data.pipeline import batches, num_batches
from mvae_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from mvae_tpu.train import loop as L
from mvae_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, restore_into, CKPT)


def run_training(model, train_ds, test_ds, args, term_masks, term_lambdas,
                 *, out_dir, meta, make_masks=None, eval_term_masks=None,
                 eval_term_lambdas=None, post_epoch=None):
    """make_masks: optional fn(np_rng) -> (masks, lambdas) per-step arrays for
    experiments with sampled ELBO terms (celeba19). eval_term_masks/lambdas
    override the eval-time terms (celeba19 evals on the joint term only,
    celeba19/train.py:332-334). post_epoch: optional fn(epoch, params, state)
    run after each eval (vision's reconstruction-grid dumps,
    vision/train.py:335-368)."""
    tx = optax.adam(args.lr)
    key = jax.random.key(getattr(args, "seed", 0))
    key, init_key = jax.random.split(key)
    params, state = model.init(init_key)
    opt_state = tx.init(params)
    rng = key

    start_epoch, best_loss = 1, float("inf")
    resume = getattr(args, "resume", None)
    if resume:
        raw, ck_meta = load_checkpoint(resume)
        tpl = {"params": params, "state": state, "opt_state": opt_state,
               "rng": jax.random.key_data(rng)}
        got = restore_into(tpl, raw)
        params, state, opt_state = got["params"], got["state"], got["opt_state"]
        rng = jax.random.wrap_key_data(jnp.asarray(got["rng"]))
        start_epoch = ck_meta["epoch"] + 1
        best_loss = ck_meta["best_loss"]
        print(f"resumed from {resume} at epoch {ck_meta['epoch']}")

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        import math
        n_use = math.gcd(n_dev, args.batch_size)  # batch must shard evenly
        if n_use > 1:
            mesh = make_mesh(n_use)
            rep = replicated(mesh)
            params, state, opt_state = jax.device_put(
                (params, state, opt_state), rep)
            print(f"data-parallel over {mesh.devices.size} devices")

    dynamic = make_masks is not None
    train_step = L.make_train_step(model, tx, term_masks, term_lambdas,
                                   dynamic_masks=dynamic)
    eval_step = L.make_eval_step(
        model,
        term_masks if eval_term_masks is None else eval_term_masks,
        term_lambdas if eval_term_lambdas is None else eval_term_lambdas)
    n_batches = num_batches(len(train_ds), args.batch_size, True)
    mask_rng = np.random.default_rng(getattr(args, "seed", 0) + 1)

    def place(batch):
        n = len(next(iter(batch.values())))
        if mesh is None or n % mesh.devices.size != 0:
            return batch          # ragged eval tail: run replicated
        s = batch_sharding(mesh)
        return {k: jax.device_put(v, s) for k, v in batch.items()}

    from mvae_tpu.utils.profiling import StepTimer, maybe_trace
    profile_dir = getattr(args, "profile_dir", None)
    timer = StepTimer()

    for epoch in range(start_epoch, args.epochs + 1):
        meter = L.AverageMeter()
        for batch_idx, batch in enumerate(batches(
                train_ds, args.batch_size, shuffle=True,
                seed=getattr(args, "seed", 0), epoch=epoch)):
            beta = annealing_factor(epoch, batch_idx, n_batches,
                                    args.annealing_epochs)
            batch = place(batch)
            trace_now = bool(profile_dir and epoch == start_epoch
                             and 2 <= batch_idx < 5)
            timer.start()
            with maybe_trace(profile_dir, trace_now):
                if dynamic:
                    masks, lambdas = make_masks(mask_rng)
                    params, state, opt_state, rng, loss, _ = train_step(
                        params, state, opt_state, rng, batch, beta,
                        jnp.asarray(masks, jnp.float32),
                        jnp.asarray(lambdas, jnp.float32))
                else:
                    params, state, opt_state, rng, loss, _ = train_step(
                        params, state, opt_state, rng, batch, beta)
                # float() blocks, so the meter also fences the async step
                loss_f = float(loss)
            timer.stop()
            meter.update(loss_f, len(next(iter(batch.values()))))
            if batch_idx % args.log_interval == 0:
                L.log_train(epoch, batch_idx, args.batch_size, len(train_ds),
                            n_batches, meter.avg, beta)
        L.log_epoch(epoch, meter.avg)
        if timer.steps_per_sec:
            print('====> Throughput: {:.2f} steps/sec'.format(
                timer.steps_per_sec))

        test_meter = L.AverageMeter()
        for batch in batches(test_ds, args.batch_size, shuffle=False):
            loss, _ = eval_step(params, state, place(batch))
            test_meter.update(float(loss), len(next(iter(batch.values()))))
        L.log_test(test_meter.avg)

        if post_epoch is not None:
            post_epoch(epoch, params, state)

        is_best = test_meter.avg < best_loss
        best_loss = min(test_meter.avg, best_loss)
        save_checkpoint(
            {"params": params, "state": state, "opt_state": opt_state,
             "rng": jax.random.key_data(rng)},
            dict(meta, epoch=epoch, best_loss=best_loss,
                 test_loss=test_meter.avg),
            is_best, out_dir)
    return params, state


def load_model_checkpoint(path, model_ctor):
    """Rebuild (model, params, state) from a checkpoint — the sample.py /
    loglike.py entry (reference load_checkpoint, mnist/train.py:124-129)."""
    raw, meta = load_checkpoint(path)
    model = model_ctor(meta["n_latents"])
    params, state = model.init(jax.random.key(0))
    tpl = {"params": params, "state": state}
    got = restore_into(tpl, {"params": raw["params"], "state": raw["state"]})
    return model, got["params"], got["state"], meta
