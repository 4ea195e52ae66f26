"""Misc helpers (reference /root/reference/vipe/utils/misc.py:21-27)."""

from __future__ import annotations

from typing import Optional, TypeVar

T = TypeVar("T")


def unpack_optional(value: Optional[T]) -> T:
    assert value is not None, "expected a non-None value"
    return value
