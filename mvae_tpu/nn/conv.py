"""NHWC convolutions with PyTorch size semantics.

The framework is NHWC end-to-end (TPU's native layout); kernels are HWIO.
Size semantics match the reference's nn.Conv2d / nn.ConvTranspose2d so the
architecture tables in SURVEY.md §2.2 carry over:

  conv2d:          out = floor((in + 2p - k)/s) + 1
  conv_transpose:  out = (in - 1)*s - 2p + k
"""

from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(params, x, *, stride: int, padding: int):
    y = lax.conv_general_dilated(
        x, params["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMS,
    )
    if "b" in params:
        y = y + params["b"]
    return y


def conv_transpose2d(params, x, *, stride: int, padding: int):
    """Matches torch ConvTranspose2d(k, stride, padding).

    Implemented as the transposed conv: input dilated by `stride`, padded
    with (k - 1 - p) on each side, correlated with the spatially-flipped
    kernel. lax.conv_transpose(transpose_kernel=True) does exactly this and
    keeps HWIO I=c_in, O=c_out layout.
    """
    k = params["w"].shape[0]
    pad = k - 1 - padding
    y = lax.conv_transpose(
        x, params["w"],
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DIMS,
        transpose_kernel=True,
    )
    if "b" in params:
        y = y + params["b"]
    return y
