"""Unit tests for the pure shape-math layer (utils.shapes)."""

import pytest

from fft_conv_tpu.utils import (
    conv_output_shape,
    conv_transpose_output_shape,
    dilated_size,
    fft_even_shape,
    next_pow2,
    stuffed_signal_size,
    to_ntuple,
)


def test_to_ntuple_int_broadcast():
    assert to_ntuple(3, 1) == (3,)
    assert to_ntuple(3, 3) == (3, 3, 3)


def test_to_ntuple_iterable_passthrough():
    assert to_ntuple((1, 2, 3), 3) == (1, 2, 3)
    assert to_ntuple([4, 5], 2) == (4, 5)


def test_to_ntuple_wrong_length_raises():
    # reference utils.py:18 error semantics
    with pytest.raises(ValueError):
        to_ntuple((1, 2), 3)
    with pytest.raises(ValueError):
        to_ntuple((1, 2, 3, 4), 3)


def test_dilated_size():
    assert dilated_size(3, 1) == 3
    assert dilated_size(3, 2) == 5
    assert dilated_size(1, 7) == 1


def test_stuffed_signal_size():
    # (s-1)*t + 1 + (k-1), reference functional.py:129
    assert stuffed_signal_size(7, 3, 2) == 15
    assert stuffed_signal_size(8, 1, 1) == 8


def test_fft_even_shape():
    assert fft_even_shape((7, 8, 9)) == (8, 8, 10)


def test_next_pow2():
    assert next_pow2(1) == 1
    assert next_pow2(2) == 2
    assert next_pow2(3) == 4
    assert next_pow2(1025) == 2048


def test_conv_output_shape():
    assert conv_output_shape((8,), (3,), (1,), (0,), (1,)) == (6,)
    assert conv_output_shape((8,), (3,), (2,), (1,), (2,)) == (3,)


def test_conv_transpose_output_shape():
    # (s-1)*t - 2p + d*(k-1) + o + 1, reference functional.py:144-154
    assert conv_transpose_output_shape((7,), (3,), (2,), (1,), (1,), (1,)) == (14,)
