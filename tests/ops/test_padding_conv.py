"""Tests for padding calculus and conv receptive-field arithmetic."""

import numpy as np
import pytest

from blvm_tpu.ops import (
    compute_conv_attributes,
    compute_conv_attributes_single,
    get_modulo_padding,
    get_same_padding,
    get_same_padding_transposed,
    pad_axis,
    pad_modulo,
    pad_same,
    pad_to_length,
    split_padding_left_right,
)
from blvm_tpu.ops.conv_arithmetic import receptive_field


class TestPaddingCalculus:
    def test_modulo_padding_makes_strideable(self):
        for length in range(5, 40):
            for stride in (2, 3, 4):
                for k in (0, 2, 3, 5):
                    if length < k:
                        continue
                    p = get_modulo_padding(length, stride, k)
                    assert (length + p - k) % stride == 0
                    assert 0 <= p < stride

    def test_same_padding_output_is_ceil(self):
        # conv output (i + p - d(k-1) - 1)//s + 1 == ceil(i / s)
        for length in range(4, 30):
            for stride in (1, 2, 3):
                for k in (2, 3, 5):
                    for d in (1, 2):
                        p = get_same_padding(length, stride, k, d)
                        out = (length + p - d * (k - 1) - 1) // stride + 1
                        assert out == -(-length // stride), (length, stride, k, d)

    def test_same_padding_transposed(self):
        assert get_same_padding_transposed(kernel_size=4, stride=2) == 2
        assert get_same_padding_transposed(kernel_size=2, stride=2) == 0
        assert get_same_padding_transposed(kernel_size=1, stride=2) == -1

    def test_split_both_puts_remainder_right(self):
        assert split_padding_left_right(5, "both") == (1, 2)
        assert split_padding_left_right(4, "both") == (1, 1)
        assert split_padding_left_right(3, "left") == (3, 0)
        assert split_padding_left_right(3, "right") == (0, 3)

    def test_pad_appliers(self):
        x = np.ones((2, 5))
        assert pad_to_length(x, 8).shape == (2, 8)
        assert pad_to_length(x, 3).shape == (2, 5)
        y = pad_modulo(np.ones((2, 7)), stride=3, kernel_size=0)
        assert y.shape[1] % 3 == 0
        # get_same_padding(10, s=2, k=4) = max(0, 3 - (10-1) % 2) = 2
        z = pad_same(np.ones((2, 10)), stride=2, kernel_size=4)
        assert z.shape == (2, 12)

    def test_negative_pad_crops(self):
        x = np.arange(10).reshape(1, 10)
        y = pad_axis(x, pad_left=-2, pad_right=-3, axis=1)
        np.testing.assert_array_equal(np.asarray(y)[0], np.arange(2, 7))


class TestConvArithmetic:
    def test_single_layer(self):
        a = compute_conv_attributes_single(i=10, k=3, p=0, s=1)
        assert a.out_size == 8 and a.receptive_field == 3 and a.stride == 1

    def test_strided(self):
        a = compute_conv_attributes_single(i=16, k=4, p=0, s=2)
        assert a.out_size == 7 and a.stride == 2 and a.receptive_field == 4

    def test_dilated(self):
        a = compute_conv_attributes_single(i=20, k=2, p=0, s=1, d=4)
        assert a.receptive_field == 5 and a.out_size == 16

    def test_wavenet_stack_receptive_field(self):
        # kernel-2 dilated stack with dilations 1,2,4,...,512 → RF = 1 + sum(d) = 1024
        dilations = [2**i for i in range(10)]
        rf = receptive_field([2] * 10, [1] * 10, dilations)
        assert rf == 1024

    def test_two_stacks_receptive_field(self):
        # 2 stacks of 5 layers: RF = 1 + 2 * (1+2+4+8+16) = 63
        dilations = [2**i for i in range(5)] * 2
        rf = receptive_field([2] * 10, [1] * 10, dilations)
        assert rf == 63

    def test_stack_composition(self):
        attrs = compute_conv_attributes([3, 3], [1, 1], [2, 2], in_shape=32)
        assert attrs.out_size == 8
        assert attrs.stride == 4

    def test_return_all(self):
        all_attrs = compute_conv_attributes([3, 3], [0, 0], [1, 1], in_shape=10, return_all=True)
        assert len(all_attrs) == 2
        assert all_attrs[0].out_size == 8 and all_attrs[1].out_size == 6
