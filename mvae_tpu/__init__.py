"""mvae_tpu — a TPU-native multimodal-VAE framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
mhw32/multimodal-vae-public (Wu & Goodman, "Multimodal Generative Models for
Scalable Weakly-Supervised Learning", NeurIPS 2018).

Design stance (vs. the reference):
  * The reference runs 3..21 sequential eager forwards per optimizer step
    (one per ELBO subset term, e.g. mnist/train.py:200-202,
    celeba19/train.py:260-304). Here every step is ONE compiled XLA program:
    encode each modality once, fuse posteriors for all subset terms with a
    masked Product-of-Experts (vmapped over the term axis), and decode all
    terms in a single batched pass that keeps the MXU busy.
  * Dynamic `image=None` dispatch becomes static presence masks — one traced
    graph covers every modality subset.
  * Parallelism is expressed with `jax.sharding` over a device Mesh
    (data/tensor/expert axes); XLA inserts the collectives.
  * The hot fusion / loss reductions have Pallas TPU kernels (mvae_tpu.ops).
"""

__version__ = "0.1.0"
