"""Model protocol: what the engine (core/engine.py) needs from an MVAE.

The reference implements six near-identical MVAE containers, one per
experiment (e.g. /root/reference/mnist/model.py:14-64). Here a model is one
object exposing pure functions over pytrees; the container logic (fusion,
reparametrization, multi-term batching) lives once in the engine.

A model instance holds ONLY static configuration (sizes), so it is safe to
close over inside jit.
"""

import jax
import jax.numpy as jnp

from mvae_tpu.core.poe import masked_product_of_experts


def stop_grads_apply(recons: dict, stop_grads) -> dict:
    """Stop the backward of decoder outputs the caller will zero-weight
    (see MultimodalVAE.decode's stop_grads contract)."""
    if not stop_grads:
        return recons
    return {k: (jax.lax.stop_gradient(v) if k in stop_grads else v)
            for k, v in recons.items()}


class MultimodalVAE:
    """Subclasses define:

    modalities: tuple[str, ...]           # stable ordering = expert order
    init(key) -> (params, state)
    encode(params, state, inputs, rng, train) -> (mu, logvar, new_state)
        inputs: dict name -> (B, ...); returns stacked (M, B, D) posteriors.
    decode(params, state, z, rng, train, stop_grads=frozenset())
        -> (recons, new_state)
        z: (B, D); recons: dict name -> (B, ...) logits. stop_grads: static
        set of decoder-group names whose outputs the caller will multiply
        by zero — wrap them in lax.stop_gradient so XLA skips their
        backward (values and BN statistics are unchanged).
    recon_loss(name, logits, target) -> (B,) per-sample loss summed over
        event dims (the reference's `torch.sum(..., dim=1)` reductions).

    State convention: state = {"enc": ..., "dec": ...}. encode() returns the
    updated "enc" subtree, decode() the updated "dec" subtree; merge_state
    reassembles. Stateless models use empty dicts.
    """

    modalities: tuple = ()
    n_latents: int = 0

    # -- conveniences shared by every experiment ---------------------------

    def modality_index(self, name: str) -> int:
        return self.modalities.index(name)

    def stop_grad_groups(self, support_row) -> frozenset:
        """Decoder groups needing NO gradient for a term whose static
        recon-weight support is `support_row` ((M,) 0/1, trace-time). The
        engine groups terms by this and decodes each group with the dead
        backward paths stopped (core/engine.py). Default: one decoder group
        per expert column, named like the modality. Models whose experts
        share a decoder stack (celeba19's 18 attr columns) override."""
        return frozenset(n for n, s in zip(self.modalities, support_row)
                         if not s)

    def merge_state(self, enc_sub, dec_sub):
        return {"enc": enc_sub, "dec": dec_sub}

    def recon_losses(self, recons, inputs):
        """(B, M) per-sample loss, one column per EXPERT. Default: one
        modality == one expert. Models with grouped experts (celeba19's 18
        attribute columns) override this with a vectorized version."""
        return jnp.stack([self.recon_loss(n, recons[n], inputs[n])
                          for n in self.modalities], axis=-1)

    def infer(self, params, state, inputs, *, rng=None, train: bool = False):
        """Fuse the posterior for exactly the modalities present in `inputs`.

        Mirrors MVAE.infer (mnist/model.py:46-64): prior expert plus one
        expert per provided modality. Absent modalities still run through
        their encoder (static graph) but are masked out of the product.
        Inputs for absent modalities may be zero-filled placeholders.
        """
        mask = jnp.array([1.0 if m in inputs else 0.0 for m in self.modalities])
        full = dict(inputs)
        b = next(iter(inputs.values())).shape[0]
        for m in self.modalities:
            if m not in full:
                full[m] = self.placeholder(m, b)
        mu, logvar, _ = self.encode(params, state, full, rng, train)
        return masked_product_of_experts(mu, logvar, mask)

    def placeholder(self, name: str, batch: int):
        """Zero-filled stand-in for an absent modality (masked out of the
        PoE, so its value is irrelevant)."""
        shape, dtype = self.input_spec()[name]
        return jnp.zeros((batch,) + shape, dtype)

    def input_spec(self):
        """dict name -> (event_shape, dtype); used for placeholders and the
        synthetic-data pipeline."""
        raise NotImplementedError
