"""Version info.

Reference parity: fft_conv_pytorch/__version__.py:1-3 (VERSION tuple), plus
the release-tag override the reference's publish workflow intends
(reference publish.yaml:29-31): FFT_CONV_TPU_VERSION, when set, wins — so
tagged releases publish under the tag instead of the checked-in default.
"""

import os
import re

VERSION = (0, 1, 0)
_env = os.environ.get("FFT_CONV_TPU_VERSION", "").lstrip("v")
if re.fullmatch(r"\d+(\.\d+)*([a-z]+\d*)?", _env):
    __version__ = _env
    VERSION = tuple(int(p) for p in re.findall(r"\d+", _env)[:3])
else:
    __version__ = ".".join(map(str, VERSION))
