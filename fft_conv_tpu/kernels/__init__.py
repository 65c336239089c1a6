from .fourstep import four_step_fft, four_step_ifft, kernel_spectrum
from .fused1d import (
    choose_fft_size,
    fft_conv1d_fused,
    fft_conv_transpose1d_fused,
    plan_fft_conv1d,
    set_fused_precision,
)
from .fused2d import (
    fft_conv2d_fused,
    fft_conv_transpose2d_fused,
    plan_fft_conv2d,
    set_fused2d_precision,
    tile_plan_2d,
)
from .fused3d import (
    fft_conv3d_fused,
    fft_conv_transpose3d_fused,
    plan_3d,
    plan_3d_blocked,
    plan_fft_conv3d,
    set_fused3d_precision,
)

__all__ = [
    "fft_conv1d_fused",
    "fft_conv2d_fused",
    "fft_conv3d_fused",
    "fft_conv_transpose1d_fused",
    "fft_conv_transpose2d_fused",
    "fft_conv_transpose3d_fused",
    "tile_plan_2d",
    "plan_3d",
    "plan_3d_blocked",
    "set_fused3d_precision",
    "set_fused2d_precision",
    "plan_fft_conv1d",
    "plan_fft_conv2d",
    "plan_fft_conv3d",
    "set_fused_precision",
    "choose_fft_size",
    "four_step_fft",
    "four_step_ifft",
    "kernel_spectrum",
]
