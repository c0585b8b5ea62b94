from mvae_tpu.core.poe import product_of_experts, masked_product_of_experts
from mvae_tpu.core.losses import (
    binary_cross_entropy_with_logits,
    cross_entropy_with_logits,
    kl_divergence,
)
from mvae_tpu.core.anneal import annealing_factor
from mvae_tpu.core.sampling import reparametrize
