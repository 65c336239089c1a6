"""Functional API alias — mirrors the reference's submodule layout.

``from fft_conv_tpu.functional import fft_conv`` works exactly like
``from fft_conv_pytorch.functional import fft_conv`` in the reference
(fft_conv_pytorch/__init__.py:1). The implementation lives in
``fft_conv_tpu.ops.functional``.
"""

from .ops.functional import complex_matmul, fft_conv, fft_conv_transpose
from .utils.shapes import to_ntuple

__all__ = ["fft_conv", "fft_conv_transpose", "complex_matmul", "to_ntuple"]
