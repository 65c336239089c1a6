"""FFT-convolution modules as JAX pytrees.

The reference builds its six layers by multiply-inheriting from
``torch.nn.Conv{1,2,3}d`` / ``ConvTranspose{1,2,3}d`` and overriding only
``forward`` (reference nn.py:7-63). The TPU-native design instead makes each
module a *registered pytree*: ``weight``/``bias`` are leaves, all
hyperparameters are static aux data. That means a module instance can be
passed straight through ``jax.jit`` / ``jax.grad`` / ``pjit`` / optax —
modules ARE their parameters, the functional-JAX idiom.

Hyperparameter semantics, validation, weight layouts
((Cout, Cin/g, *k) conv / (Cin, Cout/g, *k) transposed — reference
functional.py:109-114) and default init (see models/init.py) all match torch
so checkpoints interop bit-for-bit.
"""

from typing import Iterable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..ops.functional import fft_conv, fft_conv_transpose
from ..utils.shapes import to_ntuple
from .init import init_conv_params

IntOrTuple = Union[int, Iterable[int]]

_CONV_PADDING_MODES = ("zeros", "reflect", "replicate", "circular")


class _FFTConvBase:
    """Shared pytree plumbing for conv / transposed-conv modules."""

    ndim: int = 1  # spatial rank; overridden per subclass
    transposed: bool = False

    # hyperparameter names, in aux-data order
    _HYPERS = (
        "in_channels",
        "out_channels",
        "kernel_size",
        "stride",
        "padding",
        "output_padding",
        "dilation",
        "groups",
        "padding_mode",
        "impl",
    )

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: IntOrTuple,
        stride: IntOrTuple = 1,
        padding: IntOrTuple = 0,
        output_padding: IntOrTuple = 0,
        dilation: IntOrTuple = 1,
        groups: int = 1,
        bias: bool = True,
        padding_mode: str = "zeros",
        *,
        impl: str = "auto",
        key: Optional[jax.Array] = None,
        dtype=jnp.float32,
    ):
        n = self.ndim
        if in_channels % groups != 0:
            raise ValueError("in_channels must be divisible by groups")
        if out_channels % groups != 0:
            raise ValueError("out_channels must be divisible by groups")
        if self.transposed:
            if padding_mode != "zeros":
                raise ValueError(
                    "Only 'zeros' padding mode is supported for transposed conv"
                )
        elif padding_mode not in _CONV_PADDING_MODES:
            raise ValueError(
                f"padding_mode must be one of {_CONV_PADDING_MODES}, "
                f"got {padding_mode!r}"
            )

        self.in_channels = int(in_channels)
        self.out_channels = int(out_channels)
        self.kernel_size = to_ntuple(kernel_size, n)
        self.stride = to_ntuple(stride, n)
        self.padding = to_ntuple(padding, n)
        self.output_padding = to_ntuple(output_padding, n)
        self.dilation = to_ntuple(dilation, n)
        self.groups = int(groups)
        self.padding_mode = padding_mode
        if impl not in ("auto", "xla", "fused", "tiled"):
            raise ValueError(f"unknown impl: {impl!r}")
        self.impl = impl

        if self.transposed:
            weight_shape = (
                self.in_channels,
                self.out_channels // self.groups,
            ) + self.kernel_size
        else:
            weight_shape = (
                self.out_channels,
                self.in_channels // self.groups,
            ) + self.kernel_size

        if key is None:
            key = jax.random.key(0)
        self.weight, self.bias = init_conv_params(
            key, weight_shape, bias, self.out_channels, dtype=dtype
        )

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        aux = tuple(getattr(self, name) for name in self._HYPERS)
        return (self.weight, self.bias), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        for name, value in zip(cls._HYPERS, aux):
            setattr(obj, name, value)
        obj.weight, obj.bias = children
        return obj

    # -- torch-interop checkpointing (SURVEY §5 checkpoint/resume) ---------
    def state_dict(self):
        """Parameter dict with torch's key names and layouts."""
        out = {"weight": self.weight}
        if self.bias is not None:
            out["bias"] = self.bias
        return out

    def load_state_dict(self, state):
        """Returns a new module with parameters replaced (functional update)."""
        weight = jnp.asarray(state["weight"])
        if weight.shape != self.weight.shape:
            raise ValueError(
                f"weight shape mismatch: got {weight.shape}, "
                f"expected {self.weight.shape}"
            )
        bias = state.get("bias")
        if (bias is None) != (self.bias is None):
            raise ValueError("bias presence mismatch in state dict")
        children = (weight, None if bias is None else jnp.asarray(bias))
        return type(self).tree_unflatten(self.tree_flatten()[1], children)

    def __repr__(self):
        s = (
            f"{type(self).__name__}({self.in_channels}, {self.out_channels}, "
            f"kernel_size={self.kernel_size}, stride={self.stride}, "
            f"padding={self.padding}"
        )
        if self.transposed and any(o != 0 for o in self.output_padding):
            s += f", output_padding={self.output_padding}"
        if any(d != 1 for d in self.dilation):
            s += f", dilation={self.dilation}"
        if self.groups != 1:
            s += f", groups={self.groups}"
        if self.bias is None:
            s += ", bias=False"
        if self.padding_mode != "zeros":
            s += f", padding_mode={self.padding_mode!r}"
        return s + ")"


class _FFTConvForward(_FFTConvBase):
    """Forward via fft_conv — reference nn.py:7-22 semantics."""

    def __call__(self, signal: jax.Array) -> jax.Array:
        if signal.ndim != self.weight.ndim:
            raise ValueError(
                f"expected {self.weight.ndim}-d input (batched), "
                f"got {signal.ndim}-d"
            )
        # torch's "zeros" -> F.pad's "constant" (reference nn.py:12)
        padding_mode = "constant" if self.padding_mode == "zeros" else self.padding_mode
        return fft_conv(
            signal,
            self.weight,
            bias=self.bias,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            padding_mode=padding_mode,
            impl=self.impl,
        )


class _FFTConvTransposeForward(_FFTConvBase):
    """Forward via fft_conv_transpose — reference nn.py:25-39 semantics."""

    transposed = True

    def __call__(self, signal: jax.Array) -> jax.Array:
        if signal.ndim != self.weight.ndim:
            raise ValueError(
                f"expected {self.weight.ndim}-d input (batched), "
                f"got {signal.ndim}-d"
            )
        return fft_conv_transpose(
            signal,
            self.weight,
            bias=self.bias,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            dilation=self.dilation,
            groups=self.groups,
            impl=self.impl,
        )


@jax.tree_util.register_pytree_node_class
class FFTConv1d(_FFTConvForward):
    ndim = 1


@jax.tree_util.register_pytree_node_class
class FFTConv2d(_FFTConvForward):
    ndim = 2


@jax.tree_util.register_pytree_node_class
class FFTConv3d(_FFTConvForward):
    ndim = 3


@jax.tree_util.register_pytree_node_class
class FFTConvTranspose1d(_FFTConvTransposeForward):
    ndim = 1


@jax.tree_util.register_pytree_node_class
class FFTConvTranspose2d(_FFTConvTransposeForward):
    ndim = 2


@jax.tree_util.register_pytree_node_class
class FFTConvTranspose3d(_FFTConvTransposeForward):
    ndim = 3
