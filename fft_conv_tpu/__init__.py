"""fft_conv_tpu — a TPU-native FFT-convolution framework in JAX.

Public API mirrors the reference (fft_conv_pytorch/__init__.py:1-9): the six
module classes plus the ``functional`` and ``nn`` submodules. Additionally
exposes the TPU-specific subpackages: ``kernels`` (fused Pallas path),
``parallel`` (mesh sharding / overlap-save distribution) and ``bench``.
"""

from . import functional, nn
from .__version__ import __version__
from .nn import (
    FFTConv1d,
    FFTConv2d,
    FFTConv3d,
    FFTConvTranspose1d,
    FFTConvTranspose2d,
    FFTConvTranspose3d,
)
from .ops.functional import complex_matmul, fft_conv, fft_conv_transpose

__all__ = [
    "functional",
    "nn",
    "fft_conv",
    "fft_conv_transpose",
    "complex_matmul",
    "FFTConv1d",
    "FFTConv2d",
    "FFTConv3d",
    "FFTConvTranspose1d",
    "FFTConvTranspose2d",
    "FFTConvTranspose3d",
    "__version__",
]
