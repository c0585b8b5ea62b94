"""Pallas TPU kernels for the framework's hot ops, with jnp fallbacks.

Dispatch: `use_pallas()` is true on TPU backends (or when MVAE_PALLAS=1 for
interpreter-mode testing). The jnp reference implementations in core/ remain
the semantic ground truth; kernels are tested against them.
"""

import os

from mvae_tpu.ops.poe_pallas import masked_poe_all_terms
from mvae_tpu.ops.elbo_pallas import bce_sum
from mvae_tpu.ops.bn_pallas import bn_swish_train


def use_pallas() -> bool:
    """Opt-in only (MVAE_PALLAS=1): honest end-to-end measurement (hard
    readback fences) shows XLA's fused forms tie or beat these kernels at
    every shape the six experiments produce. The kernels remain correct
    (tested vs references, fwd+grad, interpreter AND real TPU) and are the
    in-repo pattern for when a future workload outgrows XLA's fusion."""
    return os.environ.get("MVAE_PALLAS") == "1"
