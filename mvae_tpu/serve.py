"""Serving: precompiled conditional-generation endpoints.

The reference's only inference surface is the offline sample.py scripts.
For deployment, this module wraps a trained checkpoint in jitted,
shape-stable endpoints (compile once at startup, then sub-ms device time):

    sampler = Sampler.from_checkpoint(path, MnistMVAE)
    imgs = sampler.sample(n=64, seed=0)                    # unconditional
    imgs = sampler.sample(n=64, condition={"text": 3})     # conditional
    post = sampler.embed({"image": batch})                 # posterior (mu, logvar)
    recs = sampler.reconstruct({"image": batch})           # cross-modal recon

All endpoints are deterministic functions of (checkpoint, inputs, seed).
"""

import functools

import jax
import jax.numpy as jnp

from mvae_tpu.train.driver import load_model_checkpoint


class Sampler:
    def __init__(self, model, params, state):
        self.model = model
        self.params = params
        self.state = state

        @functools.partial(jax.jit, static_argnames=("n",))
        def _sample_prior(key, n):
            z = jax.random.normal(key, (n, model.n_latents))
            recons, _ = model.decode(params, state, z, None, False)
            return _activate(recons)

        @functools.partial(jax.jit, static_argnames=("n", "names"))
        def _sample_cond(key, n, names, *values):
            cond = dict(zip(names, values))
            mu, logvar = model.infer(params, state, cond)
            std = jnp.exp(0.5 * logvar[0])
            z = mu[0] + jax.random.normal(key, (n, model.n_latents)) * std
            recons, _ = model.decode(params, state, z, None, False)
            return _activate(recons)

        @functools.partial(jax.jit, static_argnames=("names",))
        def _embed(names, *values):
            return model.infer(params, state, dict(zip(names, values)))

        def _activate(recons):
            out = {}
            for k, v in recons.items():
                out[k] = (jax.nn.softmax(v, axis=-1) if v.ndim >= 2
                          and k == "text" else jax.nn.sigmoid(v))
            return out

        self._sample_prior = _sample_prior
        self._sample_cond = _sample_cond
        self._embed = _embed
        self._activate = _activate

    @classmethod
    def from_checkpoint(cls, path, model_ctor):
        model, params, state, _ = load_model_checkpoint(path, model_ctor)
        return cls(model, params, state)

    def sample(self, n: int = 1, condition: dict = None, seed: int = 0):
        """Generate n samples of every modality; optionally conditioned on a
        dict of modality arrays (leading batch dim 1)."""
        key = jax.random.key(seed)
        if not condition:
            return self._sample_prior(key, n)
        names = tuple(sorted(condition))
        values = tuple(jnp.asarray(condition[k]) for k in names)
        return self._sample_cond(key, n, names, *values)

    def embed(self, inputs: dict):
        """Fused posterior (mu, logvar) for the provided modalities
        (compiled once per modality-set, like the other endpoints)."""
        names = tuple(sorted(inputs))
        return self._embed(names, *(jnp.asarray(inputs[k]) for k in names))

    def reconstruct(self, inputs: dict):
        """Cross-modal reconstruction: infer from `inputs`, decode ALL
        modalities from the posterior mean."""
        mu, _ = self.embed(inputs)
        recons, _ = self.model.decode(self.params, self.state, mu, None,
                                      False)
        return self._activate(recons)
