"""PRNG key plumbing discipline (SURVEY.md C1).

One root key per run; every consumer folds in a static purpose tag so adding a
new consumer never perturbs existing streams (unlike sequential splitting).
"""

from __future__ import annotations

import hashlib

import jax


def _tag_to_int(tag: str) -> int:
    # Stable 31-bit hash, independent of PYTHONHASHSEED.
    return int.from_bytes(hashlib.sha256(tag.encode()).digest()[:4], "little") & 0x7FFFFFFF


class KeyChain:
    """Derive independent named PRNG streams from a single root key.

    >>> kc = KeyChain(jax.random.key(0))
    >>> k1 = kc.key("noise", step=10)
    >>> k2 = kc.key("dropout", step=10)   # independent of k1
    """

    def __init__(self, root_key):
        self._root = root_key

    def key(self, tag: str, step: int = 0):
        k = jax.random.fold_in(self._root, _tag_to_int(tag))
        return jax.random.fold_in(k, step)

    def split(self, tag: str, num: int, step: int = 0):
        return jax.random.split(self.key(tag, step), num)
