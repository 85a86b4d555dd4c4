"""Argparse helpers (reference ``blvm/utils/argparsing.py``)."""

import argparse
from typing import Union


def parse_args_by_group(
    parser: argparse.ArgumentParser,
    args=None,
    group_positional: bool = True,
    group_optional: bool = True,
) -> argparse.Namespace:
    """Like ``parse_args()`` but returns a nested Namespace keyed by the
    parser's argument groups (so e.g. all wandb kwargs pass through wholesale)."""
    parsed = parser.parse_args(args)

    groups = dict()
    for group in parser._action_groups:
        group_kwargs = {action.dest: getattr(parsed, action.dest, None) for action in group._group_actions}
        groups[group.title] = argparse.Namespace(**group_kwargs)

    del_keys = []
    if not group_positional:
        del_keys.append("positional arguments")
    if not group_optional:
        del_keys.append("options")
    for dk in del_keys:
        if dk in groups:
            kwargs = vars(groups[dk])
            del groups[dk]
            groups.update(kwargs)

    return argparse.Namespace(**groups)


def int_or_str(arg: Union[int, str]) -> Union[int, str]:
    try:
        return int(arg)
    except ValueError:
        return arg


def float_or_str(arg: Union[float, str]) -> Union[float, str]:
    try:
        return float(arg)
    except ValueError:
        return arg


def str2bool(arg: Union[bool, str]) -> bool:
    if isinstance(arg, bool):
        return arg
    if arg.lower() in ("yes", "true", "t", "y", "1"):
        return True
    elif arg.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"Could not parse argument {arg} of type {type(arg)} as bool.")
