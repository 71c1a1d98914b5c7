"""Typed dataclass config + CLI (replaces the reference's simple_parsing
with_args decorator, app/util/arg_setup.py:12-29, and the hardcoded
config tuple of train.py:502-514).

Usage:
    @dataclass
    class Settings: ...

    @with_args(Settings)
    def main(cfg: Settings): ...

Supports --flag value CLI overrides for every dataclass field, plus
--config path/to.json to load a snapshot (arg_setup.py's load-from-file).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
from typing import Callable, Type, TypeVar, get_type_hints

T = TypeVar("T")


def _add_field_args(parser: argparse.ArgumentParser, cls: Type) -> None:
    hints = get_type_hints(cls)
    for field in dataclasses.fields(cls):
        ftype = hints.get(field.name, str)
        name = "--" + field.name.replace("_", "-")
        default = (
            field.default
            if field.default is not dataclasses.MISSING
            else (
                field.default_factory()
                if field.default_factory is not dataclasses.MISSING
                else None
            )
        )
        if ftype is bool:
            parser.add_argument(
                name,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default,
            )
        elif ftype in (int, float, str):
            parser.add_argument(name, type=ftype, default=default)
        elif ftype in (tuple, list) or str(ftype).startswith(
            ("tuple", "typing.Tuple", "list", "typing.List")
        ):
            parser.add_argument(
                name,
                type=lambda s: type(default)(
                    json.loads(s) if s.startswith("[") else
                    [int(x) if x.lstrip("-").isdigit() else float(x)
                     for x in s.split(",")]
                ),
                default=default,
            )
        else:
            parser.add_argument(name, type=str, default=default)


def parse_config(cls: Type[T], argv=None) -> T:
    parser = argparse.ArgumentParser(description=cls.__doc__)
    parser.add_argument("--config", type=str, default=None,
                        help="JSON config snapshot to load first")
    _add_field_args(parser, cls)
    ns = parser.parse_args(argv)

    values = {}
    if ns.config:
        with open(ns.config) as f:
            values.update(json.load(f))
    for field in dataclasses.fields(cls):
        cli_val = getattr(ns, field.name)
        if field.name not in values or cli_val != parser.get_default(
            field.name
        ):
            values[field.name] = cli_val
    # drop unknown keys from snapshots
    names = {f.name for f in dataclasses.fields(cls)}
    values = {k: v for k, v in values.items() if k in names}
    return cls(**values)


def with_args(cls: Type[T]):
    """Decorator: main(cfg) gets a parsed config instance
    (arg_setup.py:12-29 equivalent)."""

    def decorator(fn: Callable[[T], None]):
        @functools.wraps(fn)
        def wrapped(argv=None):
            # Every app benefits from the persistent XLA compile cache
            # (full-model TPU compiles take minutes through the remote
            # tunnel; repeat runs become near-instant).
            from qpwcnet_tpu.utils.compile_cache import (
                enable_compile_cache,
            )

            enable_compile_cache()
            return fn(parse_config(cls, argv))

        return wrapped

    return decorator
