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
Request sizes are BUCKETED to the next power of two (pad-then-slice), so a
production traffic mix compiles one graph per bucket instead of one per
observed batch size; latency is measured by scripts/serve_latency.py.
"""

import functools

import jax
import jax.numpy as jnp

from mvae_tpu.train.driver import load_model_checkpoint


def enable_compilation_cache(cache_dir: str):
    """Persist compiled executables to disk (JAX persistent compilation
    cache): a restarted serving process reloads each endpoint's executable
    from `cache_dir` instead of re-paying the ~40-90s TPU compile. The
    thresholds are zeroed so every endpoint graph is cached regardless of
    size/compile time.

    CAVEAT (this dev environment only): over the tunneled axon backend the
    cache WRITE path stalls for minutes per executable (measured: a single
    2048x2048 matmul cache-miss exceeded 240s vs ~5s uncached), so this is
    opt-in and should only be enabled on directly-attached TPU hosts,
    where executable serialization is the standard local path."""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _bucket(n: int) -> int:
    """Next power of two >= n (min 1): the compile-once batch bucket."""
    return 1 << max(0, (n - 1).bit_length())


def _pad_rows(x, m):
    """Pad the leading axis to m rows by repeating row 0 (values are
    sliced off after the compiled call)."""
    n = x.shape[0]
    if n == m:
        return x
    pad = jnp.broadcast_to(x[:1], (m - n,) + x.shape[1:])
    return jnp.concatenate([x, pad], axis=0)


class Sampler:
    def __init__(self, model, params, state, mesh=None):
        """mesh: optional jax.sharding.Mesh with a "data" axis — serving
        then runs the SAME jitted endpoints multi-chip: params/state are
        replicated, request batches shard over "data" (GSPMD inserts the
        collectives), and batch buckets round up to a multiple of the dp
        size so every chip holds equal rows. Values are identical to
        single-device serving (tested on the virtual 8-device mesh)."""
        self.model = model
        self.mesh = mesh
        self._dp = 1
        self._data_sharding = None
        if mesh is not None:
            from mvae_tpu.parallel.mesh import batch_sharding, replicated
            self._dp = int(mesh.shape["data"])
            self._data_sharding = batch_sharding(mesh)
            rep = replicated(mesh)
            params = jax.device_put(params, rep)
            state = jax.device_put(state, rep)
        self.params = params
        self.state = state

        def _constrain(z):
            if self._data_sharding is not None:
                return jax.lax.with_sharding_constraint(
                    z, self._data_sharding)
            return z

        @functools.partial(jax.jit, static_argnames=("n",))
        def _sample_prior(key, n):
            z = _constrain(jax.random.normal(key, (n, model.n_latents)))
            recons, _ = model.decode(params, state, z, None, False)
            return _activate(recons)

        @functools.partial(jax.jit, static_argnames=("n", "names"))
        def _sample_cond(key, n, names, *values):
            cond = dict(zip(names, values))
            mu, logvar = model.infer(params, state, cond)
            std = jnp.exp(0.5 * logvar[0])
            z = _constrain(mu[0] + jax.random.normal(
                key, (n, model.n_latents)) * std)
            recons, _ = model.decode(params, state, z, None, False)
            return _activate(recons)

        @functools.partial(jax.jit, static_argnames=("names",))
        def _embed(names, *values):
            return model.infer(params, state, dict(zip(names, values)))

        @functools.partial(jax.jit, static_argnames=("names",))
        def _reconstruct(names, *values):
            mu, _ = model.infer(params, state, dict(zip(names, values)))
            recons, _ = model.decode(params, state, mu, None, False)
            return _activate(recons)

        def _activate(recons):
            out = {}
            for k, v in recons.items():
                out[k] = (jax.nn.softmax(v, axis=-1) if v.ndim >= 2
                          and k == "text" else jax.nn.sigmoid(v))
            return out

        self._sample_prior = _sample_prior
        self._sample_cond = _sample_cond
        self._embed = _embed
        self._reconstruct = _reconstruct
        self._activate = _activate

    @classmethod
    def from_checkpoint(cls, path, model_ctor, cache_dir=None, mesh=None):
        """cache_dir: optional persistent-compilation-cache directory —
        restarts skip recompilation (enable_compilation_cache)."""
        if cache_dir is not None:
            enable_compilation_cache(cache_dir)
        model, params, state, _ = load_model_checkpoint(path, model_ctor)
        return cls(model, params, state, mesh=mesh)

    def _bucket_m(self, n: int) -> int:
        """Batch bucket: next power of two, rounded up to a multiple of
        the data-parallel mesh size (equal rows per chip)."""
        m = _bucket(n)
        if self._dp > 1:
            m = -(-m // self._dp) * self._dp
        return m

    def _place(self, x):
        """Shard a padded request batch over the mesh's data axis."""
        if self._data_sharding is not None:
            return jax.device_put(x, self._data_sharding)
        return x

    def warmup(self, buckets=(1, 64), conditions=None):
        """Compile the endpoints BEFORE traffic arrives: for each batch
        bucket, trace sample (prior + each condition set), embed, and
        reconstruct with zero inputs from the model's input_spec. With a
        persistent cache enabled this also populates the on-disk cache.
        conditions: iterable of modality-name tuples to precompile
        conditional sampling for; defaults to each single input."""
        spec = self.model.input_spec()
        if conditions is None:
            conditions = [(k,) for k in sorted(spec)]

        def zeros(name, n):
            shape, dtype = spec[name]
            return jnp.zeros((n,) + tuple(shape), dtype)

        for m in sorted({_bucket(n) for n in buckets}):
            self.sample(n=m)
            for names in conditions:
                self.sample(n=m, condition={k: zeros(k, 1) for k in names})
                inputs = {k: zeros(k, m) for k in names}
                self.embed(inputs)
                self.reconstruct(inputs)

    def sample(self, n: int = 1, condition: dict = None, seed: int = 0):
        """Generate n samples of every modality; optionally conditioned on a
        dict of modality arrays (leading batch dim 1). n is bucketed to the
        next power of two: one compiled graph serves all sizes in [m/2+1, m].
        """
        key = jax.random.key(seed)
        m = self._bucket_m(n)
        if not condition:
            out = self._sample_prior(key, m)
        else:
            names = tuple(sorted(condition))
            values = tuple(jnp.asarray(condition[k]) for k in names)
            out = self._sample_cond(key, m, names, *values)
        return {k: v[:n] for k, v in out.items()}

    def embed(self, inputs: dict):
        """Fused posterior (mu, logvar) for the provided modalities
        (compiled once per (modality-set, batch bucket))."""
        names = tuple(sorted(inputs))
        vals = [jnp.asarray(inputs[k]) for k in names]
        n = vals[0].shape[0]
        m = self._bucket_m(n)
        mu, logvar = self._embed(
            names, *(self._place(_pad_rows(v, m)) for v in vals))
        return mu[:n], logvar[:n]

    def reconstruct(self, inputs: dict):
        """Cross-modal reconstruction: infer from `inputs`, decode ALL
        modalities from the posterior mean."""
        names = tuple(sorted(inputs))
        vals = [jnp.asarray(inputs[k]) for k in names]
        n = vals[0].shape[0]
        m = self._bucket_m(n)
        out = self._reconstruct(
            names, *(self._place(_pad_rows(v, m)) for v in vals))
        return {k: v[:n] for k, v in out.items()}
