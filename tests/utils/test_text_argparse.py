"""Tests for argparse helpers, text cleaners and tokenizers."""

import argparse

import pytest

from blvm_tpu.data.text_cleaners import clean_timit
from blvm_tpu.data.tokenizers import char_tokenizer, word_tokenizer
from blvm_tpu.utils.argparsing import float_or_str, int_or_str, parse_args_by_group, str2bool


class TestStr2Bool:
    @pytest.mark.parametrize("s", ["yes", "TRUE", "t", "y", "1"])
    def test_true(self, s):
        assert str2bool(s) is True

    @pytest.mark.parametrize("s", ["no", "False", "f", "N", "0"])
    def test_false(self, s):
        assert str2bool(s) is False

    def test_passthrough_bool(self):
        assert str2bool(True) is True

    def test_invalid_raises(self):
        with pytest.raises(argparse.ArgumentTypeError):
            str2bool("maybe")


class TestIntFloatOrStr:
    def test_int_or_str(self):
        assert int_or_str("3") == 3
        assert int_or_str("all") == "all"

    def test_float_or_str(self):
        assert float_or_str("0.5") == 0.5
        assert float_or_str("auto") == "auto"


class TestParseArgsByGroup:
    def _parser(self):
        parser = argparse.ArgumentParser()
        parser.add_argument("--top_level", default="x")
        g = parser.add_argument_group("model")
        g.add_argument("--hidden_size", type=int, default=4)
        g.add_argument("--num_layers", type=int, default=2)
        w = parser.add_argument_group("wandb")
        w.add_argument("--project", default="p")
        return parser

    def test_nested_namespaces(self):
        args = parse_args_by_group(self._parser(), ["--hidden_size", "8"])
        assert args.model.hidden_size == 8
        assert args.model.num_layers == 2
        assert args.wandb.project == "p"
        # wandb group passes through wholesale as kwargs
        assert vars(args.wandb) == {"project": "p"}

    def test_ungrouped_optionals_flattened(self):
        args = parse_args_by_group(self._parser(), [], group_optional=False)
        assert args.top_level == "x"  # lifted out of the "options" group
        assert args.model.hidden_size == 4


class TestCleanTimit:
    def test_strips_alignment_and_normalizes(self):
        raw = "0 24000 The dog; RAN fast:\n24000 48000 And STOPPED \"here\"\n"
        out = clean_timit(raw)
        assert out == 'the dog, ran fast. and stopped  here '

    def test_phone_file_lines(self):
        raw = "0 100 h#\n100 200 ah\n200 300 s\n"
        assert clean_timit(raw) == "h# ah s"


class TestTokenizers:
    def test_word(self):
        assert word_tokenizer("a bc  d") == ["a", "bc", "d"]

    def test_char(self):
        assert char_tokenizer("ab c") == ["a", "b", " ", "c"]
