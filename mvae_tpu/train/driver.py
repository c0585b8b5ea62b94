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

Multi-process (multi-host slices, SURVEY.md §2.5): `--distributed` /
`--coordinator host:port --process-id i --n-processes N` bootstraps
jax.distributed before the first backend touch; batches are then fed
per-process (each host materializes only its shard rows,
parallel/distributed.py) and only process 0 logs/checkpoints. A 2-process
CPU test asserts global-mesh steps equal the single-process run
(tests/test_multiprocess.py). Multi-process + tensor-parallel checkpointing
(non-addressable param shards) is out of scope at this model scale — dp
keeps params replicated, which is the only shipped multi-process mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvae_tpu.core.anneal import annealing_factor, annealing_factor_from_step
from mvae_tpu.data.pipeline import batches, num_batches
from mvae_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from mvae_tpu.train import loop as L
from mvae_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, restore_into)


def run_training(model, train_ds, test_ds, args, term_masks, term_lambdas,
                 *, out_dir, meta, make_masks=None, eval_term_masks=None,
                 eval_term_lambdas=None, recon_masks=None,
                 eval_recon_masks=None, recon_support=None,
                 fast_skip_decode=False, post_epoch=None,
                 eval_progress=False):
    """make_masks: optional fn(np_rng) -> (masks, lambdas) per-step arrays for
    experiments with sampled ELBO terms (celeba19). eval_term_masks/lambdas
    override the eval-time terms (celeba19 evals on the joint term only,
    celeba19/train.py:332-334). recon_masks/eval_recon_masks: optional (T, M)
    reconstruction masks decoupled from the posterior masks (vision's
    unimodal terms reconstruct all six modalities, vision/train.py:227-283).
    post_epoch: optional fn(epoch, params, state) run after each eval
    (vision's reconstruction-grid dumps, vision/train.py:335-368)."""
    # Multi-process bootstrap FIRST — jax.distributed.initialize must run
    # before the first backend touch (model.init below). (0, 1) when the
    # run is not distributed. Per-host data feeding below keys off n_proc.
    from mvae_tpu.parallel.distributed import maybe_initialize, global_batch
    proc_id, n_proc = maybe_initialize(args)
    coordinator = proc_id == 0

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
        if "opt_state" in raw:
            tpl = {"params": params, "state": state, "opt_state": opt_state,
                   "rng": jax.random.key_data(rng)}
            got = restore_into(tpl, raw)
            params, state, opt_state = (got["params"], got["state"],
                                        got["opt_state"])
            rng = jax.random.wrap_key_data(jnp.asarray(got["rng"]))
            start_epoch = ck_meta["epoch"] + 1
            best_loss = ck_meta["best_loss"]
            print(f"resumed from {resume} at epoch {ck_meta['epoch']}")
        else:
            # params-only checkpoint (e.g. an imported reference .pth.tar —
            # scripts/import_torch_checkpoint.py): warm-start with a fresh
            # optimizer/PRNG from epoch 1
            got = restore_into({"params": params, "state": state},
                               {"params": raw["params"],
                                "state": raw["state"]})
            params, state = got["params"], got["state"]
            print(f"warm-started from {resume} (params only; "
                  f"fresh optimizer)")

    # Mesh policy: ALL visible devices always participate. The batch axis
    # shards over gcd(n_devices, batch_size) chips; when the batch does not
    # divide evenly (the reference's fixed batch 100 on a v5e-8 gives
    # gcd=4), the remaining factor goes to the "model" mesh axis as tensor/
    # expert parallelism (shard_params_tp) instead of idling half the slice
    # — a dp x tp decomposition with semantics identical to single-device
    # (tested batch-100-on-8 in tests/test_sharded_device_data.py).
    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        import math
        from mvae_tpu.parallel.mesh import shard_params_tp
        n_dp = math.gcd(n_dev, args.batch_size)
        n_tp = n_dev // n_dp
        if n_proc > 1 and n_tp > 1:
            raise SystemExit(
                f"multi-process runs ship data-parallel only (params stay "
                f"replicated so every host can checkpoint/eval them); pick "
                f"a --batch-size divisible by the {n_dev} global devices "
                f"(got {args.batch_size})")
        mesh = make_mesh(n_dev, data=n_dp, model=n_tp)
        rep = replicated(mesh)
        if n_tp > 1:
            from jax.sharding import NamedSharding
            params = shard_params_tp(params, mesh)
            state = jax.device_put(state, rep)
            # adam's mu/nu mirror the params' TP shardings; scalars (count)
            # and anything tx.init left off-mesh replicate
            tmpl = tx.init(params)

            def _sh(t):
                s = getattr(t, "sharding", None)
                return (s if isinstance(s, NamedSharding)
                        and s.mesh == mesh else rep)
            opt_state = jax.tree_util.tree_map(
                lambda v, t: jax.device_put(v, _sh(t)), opt_state, tmpl)
            if coordinator:
                print(f"mesh over all {n_dev} devices: {n_dp}-way data x "
                      f"{n_tp}-way tensor/expert parallel (batch "
                      f"{args.batch_size} is not divisible by {n_dev}; the "
                      f"leftover factor shards parameters, not nothing)")
        else:
            # multi-process note: device_put of identical host values to a
            # fully-replicated global sharding is the supported JAX path
            # (every process calls it with the same bytes — same init key,
            # same checkpoint)
            params, state, opt_state = jax.device_put(
                (params, state, opt_state), rep)
            if coordinator:
                print(f"data-parallel over all {n_dev} devices"
                      + (f" across {n_proc} processes" if n_proc > 1
                         else ""))

    # Device-resident input pipeline: when the dataset fits an HBM budget,
    # park ALL data on the chip(s) (images as uint8, 4x smaller; decoded to
    # f32 inside the step) and transfer only batch indices per step. Over
    # this environment's tunneled chip that turns a transfer-bound 24
    # steps/sec into compute-bound training. Under a mesh the data shards
    # over the "data" axis — each chip keeps 1/D of the set resident and
    # gathers only local rows (loop.gather_local), so the multi-chip
    # configuration IS the fast configuration.
    def _bytes(ds):
        return sum(v.nbytes // (4 if _is_image(v) else 1)
                   for v in ds.arrays.values())

    def _is_image(v):
        return v.dtype == np.float32 and v.ndim >= 3

    n_shards = mesh.shape["data"] if mesh is not None else 1

    def _to_device_data(ds):
        n = len(ds) - len(ds) % n_shards
        out = {}
        for k, v in ds.arrays.items():
            if _is_image(v):
                v = np.round(v * 255.0).astype(np.uint8)
            v = np.ascontiguousarray(v[:n]).reshape(
                (n_shards, n // n_shards) + v.shape[1:])
            if mesh is None:
                out[k] = jax.device_put(v)
            elif n_proc == 1:
                out[k] = jax.device_put(v, batch_sharding(mesh))
            else:
                # per-host feeding: every process holds the same full
                # dataset (same loader, same seed); each keeps only its
                # shard-rows and assembles the global array
                from mvae_tpu.parallel.distributed import process_rows
                s = batch_sharding(mesh)
                lo, hi = process_rows(s, n_shards)
                out[k] = global_batch(s, v[lo:hi], v.shape)
        return out

    device_data = (not getattr(args, "no_device_data", False)
                   and args.batch_size % n_shards == 0
                   and (_bytes(train_ds) + _bytes(test_ds)) // n_shards
                   < 6 * 2 ** 30)

    dynamic = make_masks is not None
    ev_masks = term_masks if eval_term_masks is None else eval_term_masks
    ev_lambdas = (term_lambdas if eval_term_lambdas is None
                  else eval_term_lambdas)
    if device_data:
        # fused K-step dispatches: one loss buffer (=> one ~40ms tunnel
        # fetch) per logging window instead of per step
        multi_step = L.make_multi_train_step(model, tx, term_masks,
                                             term_lambdas,
                                             dynamic_masks=dynamic,
                                             recon_masks=recon_masks,
                                             recon_support=recon_support,
                                             fast_skip_decode=fast_skip_decode)
        multi_eval = L.make_multi_eval_step(model, ev_masks, ev_lambdas,
                                            recon_masks=eval_recon_masks)
        train_dev = _to_device_data(train_ds)
        test_dev = _to_device_data(test_ds)
        tail_eval = [None]     # lazily-built ragged-tail eval (one compile)
        shard_note = (f", sharded over {n_shards} chips"
                      if n_shards > 1 else "")
        if coordinator:
            print("input pipeline: device-resident "
                  f"({_bytes(train_ds) / 2**20:.0f} MiB on-chip"
                  f"{shard_note}), {args.log_interval} steps/dispatch")
    else:
        train_step = L.make_train_step(model, tx, term_masks, term_lambdas,
                                       dynamic_masks=dynamic,
                                       recon_masks=recon_masks,
                                       recon_support=recon_support,
                                       fast_skip_decode=fast_skip_decode)
        eval_step = L.make_eval_step(model, ev_masks, ev_lambdas,
                                     recon_masks=eval_recon_masks)
    n_batches = num_batches(len(train_ds), args.batch_size, True)
    mask_rng = np.random.default_rng(getattr(args, "seed", 0) + 1)

    def place(batch):
        n = len(next(iter(batch.values())))
        if mesh is None or n % mesh.shape["data"] != 0:
            return batch          # ragged eval tail: run replicated
        s = batch_sharding(mesh)
        if n_proc > 1:
            from mvae_tpu.parallel.distributed import global_batch_tree
            return global_batch_tree(s, batch, n)
        return {k: jax.device_put(v, s) for k, v in batch.items()}

    seed = getattr(args, "seed", 0)

    import time as _time
    from mvae_tpu.utils.profiling import maybe_trace
    profile_dir = getattr(args, "profile_dir", None)

    def run_epoch_device(epoch, params, state, opt_state, rng, meter):
        """Chunked lax.scan dispatches over the shuffled index matrix.

        Multi-chip: each shard shuffles and consumes its OWN resident rows
        (sharded-files semantics — every example is seen once per epoch,
        batch composition is per-shard rather than a global shuffle)."""
        B, K = args.batch_size, max(1, args.log_interval)
        D = n_shards
        b = B // D
        n_loc = (len(train_ds) - len(train_ds) % D) // D
        perms = np.stack([
            np.random.default_rng(np.random.SeedSequence(
                [seed, epoch, d])).permutation(n_loc)
            for d in range(D)])                       # (D, n_loc)
        steps = n_loc // b
        step_i = 0
        for lo in range(0, steps, K):
            k = min(K, steps - lo)
            idxs = jnp.asarray(
                perms[:, lo * b:(lo + k) * b]
                .reshape(D, k, b).transpose(1, 0, 2), jnp.int32)  # (k, D, b)
            if args.annealing_epochs > 0:
                # traced schedule form — same values as annealing_factor
                # (asserted in tests/test_losses.py), vectorized over the
                # window
                gsteps = (epoch - 1) * n_batches + step_i + np.arange(k)
                betas = jnp.asarray(annealing_factor_from_step(
                    gsteps, n_batches, args.annealing_epochs), jnp.float32)
            else:
                betas = jnp.ones((k,), jnp.float32)
            if dynamic:
                ms, ls = zip(*[make_masks(mask_rng) for _ in range(k)])
                extra = (jnp.asarray(np.stack(ms), jnp.float32),
                         jnp.asarray(np.stack(ls), jnp.float32))
            else:
                extra = ()
            # --profile-dir: trace the SECOND dispatch window of the first
            # epoch (the first window pays the compile) on this default
            # device-resident path
            trace_now = bool(profile_dir and epoch == start_epoch
                             and (lo == K or (steps <= K and lo == 0)))
            with maybe_trace(profile_dir, trace_now):
                params, state, opt_state, rng, losses = multi_step(
                    params, state, opt_state, rng, train_dev, idxs, betas,
                    *extra)
                if trace_now:       # keep execution inside the trace
                    jax.block_until_ready(losses)
            for v in np.asarray(losses):          # ONE fetch per window
                meter.update(float(v), B)
            step_i += k
            if coordinator:
                L.log_train(epoch, step_i - k, B, len(train_ds), n_batches,
                            meter.avg, float(betas[0]))
        return params, state, opt_state, rng, step_i

    def run_epoch_host(epoch, params, state, opt_state, rng, meter):
        pending, step_i = [], 0
        for b in batches(train_ds, args.batch_size, shuffle=True,
                         seed=seed, epoch=epoch):
            batch = place(b)
            n_ex = len(next(iter(b.values())))
            beta = annealing_factor(epoch, step_i, n_batches,
                                    args.annealing_epochs)
            trace_now = bool(profile_dir and epoch == start_epoch
                             and 2 <= step_i < 5)
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
            pending.append((loss, n_ex))
            if step_i % args.log_interval == 0:
                for lo, n in pending:      # bulk sync at the log boundary
                    meter.update(float(lo), n)
                pending.clear()
                if coordinator:
                    L.log_train(epoch, step_i, args.batch_size,
                                len(train_ds), n_batches, meter.avg, beta)
            step_i += 1
        for lo, n in pending:
            meter.update(float(lo), n)
        return params, state, opt_state, rng, step_i

    for epoch in range(start_epoch, args.epochs + 1):
        meter = L.AverageMeter()
        epoch_t0 = _time.perf_counter()
        if device_data:
            params, state, opt_state, rng, n_steps = run_epoch_device(
                epoch, params, state, opt_state, rng, meter)
        else:
            params, state, opt_state, rng, n_steps = run_epoch_host(
                epoch, params, state, opt_state, rng, meter)
        epoch_dt = _time.perf_counter() - epoch_t0
        if coordinator:
            L.log_epoch(epoch, meter.avg)
            if n_steps > 1 and epoch > start_epoch:  # skip the compile epoch
                print('====> Throughput: {:.2f} steps/sec'.format(
                    n_steps / epoch_dt))

        test_meter = L.AverageMeter()
        if device_data:
            B = args.batch_size
            D = n_shards
            b = B // D
            n_loc = (len(test_ds) - len(test_ds) % D) // D
            ev_steps = n_loc // b
            if ev_steps:
                base = np.arange(ev_steps * b).reshape(ev_steps, 1, b)
                idxs = jnp.asarray(
                    np.broadcast_to(base, (ev_steps, D, b)), jnp.int32)
                for v in np.asarray(multi_eval(params, state, test_dev,
                                               idxs)):
                    test_meter.update(float(v), B)
            # ragged tail: rows beyond the full-batch windows (per-shard
            # local tails + the global len%D drop). The reference's test()
            # sees every example (mnist/train.py:229-253); evaluate the
            # remainder as one host-fed replicated batch so the device path
            # reports the same weighted mean as the host path.
            tail = np.concatenate(
                [np.arange(d * n_loc + ev_steps * b, (d + 1) * n_loc)
                 for d in range(D)]
                + [np.arange(D * n_loc, len(test_ds))]).astype(np.int64)
            if len(tail):
                if tail_eval[0] is None:
                    tail_eval[0] = L.make_eval_step(
                        model, ev_masks, ev_lambdas,
                        recon_masks=eval_recon_masks)
                tb = {k: v[tail] for k, v in test_ds.arrays.items()}
                loss, _ = tail_eval[0](params, state, tb)
                test_meter.update(float(loss), len(tail))
        else:
            eval_pending = []
            ev_iter = batches(test_ds, args.batch_size, shuffle=False)
            if eval_progress:
                # the reference's only other observability surface: a tqdm
                # bar over the test loader (celeba/train.py:226,247-249)
                try:
                    from tqdm import tqdm
                    ev_iter = tqdm(ev_iter, total=num_batches(
                        len(test_ds), args.batch_size, False))
                except ImportError:
                    pass
            for b in ev_iter:
                loss, _ = eval_step(params, state, place(b))
                eval_pending.append((loss, len(next(iter(b.values())))))
            for lo, n in eval_pending:
                test_meter.update(float(lo), n)
        if coordinator:
            L.log_test(test_meter.avg)

        if post_epoch is not None and coordinator:
            post_epoch(epoch, params, state)

        is_best = test_meter.avg < best_loss
        best_loss = min(test_meter.avg, best_loss)
        if coordinator:
            # eval losses are replicated outputs, so best_loss is identical
            # on every process; only the coordinator touches the filesystem
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
