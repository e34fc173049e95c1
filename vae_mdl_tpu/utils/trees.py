"""Small pytree path helpers shared across the package.

flax/jax key-path entries are ``DictKey`` (``.key``) / ``GetAttrKey``
(``.name``) / sequence keys; stringifying them was hand-copied in three
places (import_reference, init_output_bias) before this module existed.
"""
from __future__ import annotations

from typing import Tuple


def key_name(k) -> str:
    """One key-path entry -> its string name."""
    return getattr(k, "key", getattr(k, "name", str(k)))


def path_tuple(path) -> Tuple[str, ...]:
    """A jax key path -> tuple of string names."""
    return tuple(key_name(k) for k in path)
