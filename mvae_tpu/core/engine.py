"""Multi-term ELBO engine — one compiled graph per optimizer step.

The reference's training step runs one full eager forward PER ELBO subset
term: 3 for mnist/fashionmnist/multimnist/celeba (mnist/train.py:200-202),
7 for vision (vision/train.py:186-214), 21+ for celeba19
(celeba19/train.py:260-304). Each forward re-encodes the same batch and
re-decodes every modality.

TPU-native reformulation (this module):

  1. Encode each modality ONCE per step (the reference re-encodes the same
     inputs for every term — identical results, wasted FLOPs).
  2. Fuse all T subset posteriors at once: vmap(masked PoE) over a (T, M)
     presence-mask matrix.
  3. Reparametrize with a single (T, B, D) normal draw (independent noise per
     term, matching the reference's independent forwards).
  4. Decode all T terms in one vmapped pass — XLA folds the term axis into
     the batch of every matmul/conv, so the MXU sees batch T*B.
  5. Reduce the (T, M) masked/weighted losses + per-term KL in one fusion.

BatchNorm note: decoders with BN are vmapped over the term axis, so batch
statistics are per-term — the same statistics the reference's
one-forward-per-term evaluation sees. Running stats are committed with the
EXACT sequential-EMA composition the reference produces (one commit per
term in term order for decoders, one commit per term-where-present for
encoders): each vmapped per-term state is affine in that term's batch
moments, so the T sequential updates fold into a closed form
(commit_ema_states). Verified against torch's sequential commits at f32
tolerance in tests/test_golden_parity_conv.py (the one-pass batch-moment
default, nn/norm.py, differs from torch's two-pass at the f32 rounding
floor; MVAE_BN_TWO_PASS=1 restores the textbook form).
"""

import jax
import jax.numpy as jnp

from mvae_tpu.core.poe import masked_product_of_experts
from mvae_tpu.core.losses import kl_divergence
from mvae_tpu.core.sampling import reparametrize
from mvae_tpu.nn.norm import BN_MOMENTUM


def _use_pallas() -> bool:
    import os
    return os.environ.get("MVAE_PALLAS") == "1" and len(jax.devices()) == 1


def commit_ema_states(model, state, enc_state, dec_states, term_masks):
    """Reproduce the reference's sequential BN-EMA commits exactly.

    The reference runs one eager forward per ELBO term: every forward
    decodes ALL modalities (so decoder BN stats get T sequential commits in
    term order, mnist/train.py:200-202), and encodes only the PRESENT
    modalities (so modality m's encoder gets sum(term_masks[:, m]) commits,
    all with identical batch moments since the batch does not change within
    a step).

    The engine computes each term's candidate state once (vmapped):
      s_t = (1-mom)*old + mom*m_t,  which is affine in the term's moments
    so the sequential composition folds closed-form:
      new = (1-mom)^T old + sum_t (1-mom)^(T-1-t) (s_t - (1-mom) old)
    and the k identical encoder commits fold to
      new = old + ((1-(1-mom)^k)/mom) (s - old).

    Assumes every stateful layer is a BatchNorm running-stat EMA with the
    framework-wide BN_MOMENTUM (nn/norm.py).
    """
    mom = BN_MOMENTUM
    T = term_masks.shape[0]

    def _seq(old, stacked):        # stacked: (T, ...) per-term states
        w = (1.0 - mom) ** jnp.arange(T - 1, -1, -1)
        w = w.reshape((T,) + (1,) * (stacked.ndim - 1)).astype(stacked.dtype)
        return ((1.0 - mom) ** T * old
                + jnp.sum(w * (stacked - (1.0 - mom) * old), axis=0))

    dec_new = jax.tree_util.tree_map(_seq, state["dec"], dec_states)

    enc_new = {}
    for name, sub in enc_state.items():    # keyed by modality name
        k = jnp.sum(term_masks[:, model.modality_index(name)])
        q = 1.0 - (1.0 - mom) ** k         # k folded same-moment commits
        enc_new[name] = jax.tree_util.tree_map(
            lambda old, s: old + (q / mom) * (s - old),
            state["enc"][name], sub)
    return model.merge_state(enc_new, dec_new)


def _decode_grouped(model, params, state, z, dec_keys, train, support,
                    skip_nograd=False, loss_fn=None):
    """Decode the T terms grouped by their STATIC recon-weight support,
    stopping the gradient of decoder groups a term can never train
    (model.stop_grad_groups). Values, BN statistics, and gradients are
    identical to the ungrouped decode — terms with zero static support
    contribute exactly-zero gradients there anyway — but XLA drops the
    dead backward graphs: on celeba19, 18 of 21 terms skip the image
    deconv backward (measured 16.8 -> 9.9 ms/step f32 on v5e-1).

    support: numpy (T, M) 0/1, trace-time upper bound of the runtime recon
    weights (masks * lambdas != 0).

    skip_nograd: opt-in FAST mode — groups in model.skip_decode_groups are
    not merely gradient-stopped but SKIPPED (the model returns zeros and
    its incoming BN state). Losses, per-term ELBOs, and gradients are still
    exactly unchanged (the skipped recon has weight zero), but that
    decoder's BN running stats no longer see the skipped terms' batch
    moments — a documented divergence from the reference's decode-
    everything-every-term statistics.

    Models may additionally define decode_group_key(support_row) -> key and
    decode_term_operands(support_rows) -> per-term traced pytree: terms
    whose static support needs only a strict subset of a STACKED stateless
    decoder (celeba19's 18 single-attribute terms each need 1 of the 18
    attr experts) are grouped by that key and decode with per-term gathered
    expert params — mathematically identical losses/gradients (the other
    experts' recon weights are statically zero and no BN stats exist;
    numerically equal within float reassociation, asserted at rtol 5e-4
    in tests/test_celeba19.py), ~7x fewer expert-decode FLOPs on the
    celeba19 step.

    loss_fn: optional recons-dict -> (B, M) per-term loss rows, applied
    INSIDE each group's vmap so only the small loss rows cross the group
    concat — without it the full per-group recon logits (celeba19:
    (21, B, 64, 64, 3)) are concatenated in term order first, and the
    v5e trace shows XLA spending ~600 us/step on layout copies of
    exactly that tensor (two 51.6 MB copies + a reshape,
    scripts/roofline_family.py --family celeba19). Same math, same
    reduction axes — values equal within float reassociation."""
    import numpy as np
    T = z.shape[0]
    variant_of = getattr(model, "decode_group_key", lambda row: None)
    groups = {}
    for t in range(T):
        row = tuple(support[t])
        groups.setdefault((model.stop_grad_groups(row), variant_of(row)),
                          []).append(t)
    stop0, var0 = next(iter(groups))
    if len(groups) == 1 and not stop0 and var0 is None:
        def _plain(zt, kt):
            r, s = model.decode(params, state, zt, kt, train)
            return (r if loss_fn is None else loss_fn(r)), s
        return jax.vmap(_plain)(z, dec_keys)
    # stateless decoder groups (no BN) can ALWAYS be skipped when their
    # recon weight is statically zero — no statistics exist to diverge;
    # stateful (BN) groups additionally need the fast-mode opt-in
    skippable = frozenset(getattr(model, "exact_skip_groups", ()))
    if skip_nograd:
        skippable = skippable | frozenset(
            getattr(model, "skip_decode_groups", ()))
    order, rec_parts, st_parts = [], [], []
    for (stop, variant), idxs in groups.items():
        ia = np.asarray(idxs)
        skip = stop & skippable
        kw = {"skip_decodes": skip} if skip else {}
        def _term(zt, kt, op=None, _stop=stop - skip, _kw=kw):
            extra = {} if op is None else {"term_operand": op}
            r, s = model.decode(params, state, zt, kt, train,
                                stop_grads=_stop, **extra, **_kw)
            return (r if loss_fn is None else loss_fn(r)), s
        if variant is not None:
            operands = model.decode_term_operands(support[ia])
            r, s = jax.vmap(_term)(z[ia], dec_keys[ia], operands)
        else:
            r, s = jax.vmap(_term)(z[ia], dec_keys[ia])
        order.extend(idxs)
        rec_parts.append(r)
        st_parts.append(s)
    perm = np.argsort(np.asarray(order))      # static regroup to term order
    recons = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0)[perm], *rec_parts)
    dec_states = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0)[perm], *st_parts)
    return recons, dec_states


def grouped_term_loss_default() -> bool:
    """Default for the grouped term-loss fusion (engine `_decode_grouped
    loss_fn`): the `MVAE_GROUPED_TERM_LOSS` env var, read ONCE when a step
    function is BUILT/TRACED. Flipping the env var after a step is compiled
    (or under a warm persistent compilation cache) has no effect — for an
    A/B, set it before process start or pass `grouped_term_loss=` explicitly
    to make_*_step / multi_term_elbo. (See BASELINE.md "grouped-term-loss".)
    """
    import os
    return os.environ.get("MVAE_GROUPED_TERM_LOSS", "1") == "1"


def multi_term_elbo(model, params, state, inputs, term_masks, term_lambdas,
                    rng, beta, *, train: bool, recon_masks=None,
                    recon_support=None, fast_skip_decode=False,
                    grouped_term_loss=None):
    """Compute sum over T subset-ELBO terms in one traced graph.

    model:        MultimodalVAE (static).
    inputs:       dict name -> (B, ...) arrays, ALL modalities present.
    term_masks:   (T, M) 0/1 — which experts participate in each term's
                  POSTERIOR fusion.
    recon_masks:  (T, M) 0/1 — which reconstruction losses count for each
                  term. Defaults to term_masks (mnist/fashionmnist/
                  multimnist/celeba/celeba19 reconstruct exactly the subset's
                  modalities, e.g. mnist/train.py:205-213,
                  celeba19/train.py:264-302). Vision decouples them: every
                  unimodal posterior reconstructs ALL six modalities
                  (vision/train.py:227-283), so it passes all-ones here.
    term_lambdas: (T, M) per-term per-modality loss weights.
    recon_support: optional STATIC numpy (T, M) 0/1 upper bound of the
                  runtime recon weights; enables grouped decoding with dead
                  backward paths stopped (_decode_grouped). Training only.
    beta:         KL annealing factor (scalar, traced).

    Returns (total_loss, aux, new_state) where aux has per-term ELBOs and the
    complete-term posterior (term 0 by convention).
    """
    M = len(model.modalities)
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3

    # 1. encode every modality once
    mu, logvar, enc_state = model.encode(params, state, inputs, rngs[0], train)
    # mu, logvar: (M, B, D)

    # 2. fuse every term's posterior. The Pallas all-terms kernel
    # (ops/poe_pallas.py) is validated-correct but measured to TIE or
    # slightly lose against XLA's fused vmap form at every tested shape
    # (celeba19 22x19: 59.6 vs 58.3 steps/sec with honest fencing) — the
    # guide's rule holds: don't hand-schedule what XLA already fuses.
    # Opt in with MVAE_PALLAS=1 (single-chip only).
    if _use_pallas():
        from mvae_tpu.ops.poe_pallas import masked_poe_all_terms
        pd_mu, pd_logvar = masked_poe_all_terms(mu, logvar, term_masks)
    else:
        fuse = jax.vmap(masked_product_of_experts, in_axes=(None, None, 0))
        pd_mu, pd_logvar = fuse(mu, logvar, term_masks)      # (T, B, D)

    # 3. reparametrize (independent eps per term); eval mode returns the
    # mean (mnist/model.py:34-35)
    z = reparametrize(rngs[1], pd_mu, pd_logvar, train=train)

    # 4. decode all terms at once
    T = term_masks.shape[0]
    dec_keys = (jax.random.split(rngs[2], T) if rngs[2] is not None
                else jnp.zeros((T, 2), jnp.uint32))
    # 5 is fused into 4 on the grouped train path (below): recon_losses
    # gives (B, M) per term — M = number of EXPERTS (celeba19's 18
    # per-attribute experts are columns of one vectorized call, not a
    # Python loop). Computing it INSIDE each decode group keeps the full
    # (T, B, ...) recon logits from being concatenated/layout-copied
    # (see _decode_grouped loss_fn). grouped_term_loss=None defers to
    # MVAE_GROUPED_TERM_LOSS, read at TRACE time — see
    # grouped_term_loss_default() for the A/B caveat.
    fuse_loss = (grouped_term_loss_default() if grouped_term_loss is None
                 else grouped_term_loss)
    if train and recon_support is not None:
        recon_stack, dec_states = _decode_grouped(
            model, params, state, z, dec_keys, train, recon_support,
            skip_nograd=fast_skip_decode,
            loss_fn=(lambda rt: model.recon_losses(rt, inputs))
            if fuse_loss else None)
        if not fuse_loss:
            recon_stack = jax.vmap(
                lambda rt: model.recon_losses(rt, inputs))(recon_stack)
    else:
        recons, dec_states = jax.vmap(
            lambda zt, kt: model.decode(params, state, zt, kt, train)
        )(z, dec_keys)
        recon_stack = jax.vmap(
            lambda rt: model.recon_losses(rt, inputs))(recons)  # (T, B, M)
    rmask = term_masks if recon_masks is None else recon_masks
    w = (rmask * term_lambdas)[:, None, :]                    # (T, 1, M)
    recon = jnp.sum(recon_stack * w, axis=-1)                 # (T, B)

    kld = kl_divergence(pd_mu, pd_logvar)                     # (T, B)
    per_term = jnp.mean(recon + beta * kld, axis=1)           # (T,)
    total = jnp.sum(per_term)

    if train:
        new_state = commit_ema_states(model, state, enc_state, dec_states,
                                      term_masks)
    else:
        new_state = state
    aux = {"per_term": per_term, "mu": pd_mu[0], "logvar": pd_logvar[0]}
    return total, aux, new_state
