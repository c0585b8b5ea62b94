"""Minimal functional NN layer library (pure pytrees, explicit RNG/state).

Every layer is an (init, apply) pair over plain dict pytrees. Stateful layers
(BatchNorm) thread an explicit `state` pytree. Initialization distributions
match PyTorch defaults so that training dynamics are comparable with the
reference implementation.
"""

from mvae_tpu.nn.initializers import (
    kaiming_uniform_bound,
    linear_init,
    conv_init,
    conv_transpose_init,
    embedding_init,
    gru_init,
)
from mvae_tpu.nn.layers import (
    linear,
    embedding,
    swish,
    dropout,
    mlp_init,
    mlp_apply,
)
from mvae_tpu.nn.conv import conv2d, conv_transpose2d
from mvae_tpu.nn.norm import batchnorm_init, batchnorm_apply
from mvae_tpu.nn.rnn import gru_cell, gru_layer, bigru_last_step
