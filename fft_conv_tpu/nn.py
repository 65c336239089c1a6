"""nn API alias — mirrors the reference's submodule layout.

``from fft_conv_tpu.nn import FFTConv2d`` works exactly like
``from fft_conv_pytorch.nn import FFTConv2d`` (reference nn.py:42-63).
The pytree module implementations live in ``fft_conv_tpu.models.modules``.
"""

from .models.modules import (
    FFTConv1d,
    FFTConv2d,
    FFTConv3d,
    FFTConvTranspose1d,
    FFTConvTranspose2d,
    FFTConvTranspose3d,
    _FFTConvForward,
    _FFTConvTransposeForward,
)

__all__ = [
    "FFTConv1d",
    "FFTConv2d",
    "FFTConv3d",
    "FFTConvTranspose1d",
    "FFTConvTranspose2d",
    "FFTConvTranspose3d",
]
