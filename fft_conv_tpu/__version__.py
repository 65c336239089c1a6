"""Version info.

Reference parity: fft_conv_pytorch/__version__.py:1-3 (VERSION tuple).
"""

VERSION = (0, 1, 0)
__version__ = ".".join(map(str, VERSION))
