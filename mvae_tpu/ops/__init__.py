"""Pallas TPU kernels for the framework's hot ops, with jnp fallbacks.

Dispatch: `use_pallas()` is true on TPU backends (or when MVAE_PALLAS=1 for
interpreter-mode testing). The jnp reference implementations in core/ remain
the semantic ground truth; kernels are tested against them.
"""

import os

from mvae_tpu.ops.poe_pallas import masked_poe_all_terms
from mvae_tpu.ops.elbo_pallas import bce_sum


def use_pallas() -> bool:
    if os.environ.get("MVAE_PALLAS") == "0":
        return False
    if os.environ.get("MVAE_PALLAS") == "1":
        return True
    import jax
    return jax.default_backend() in ("tpu", "axon")
