"""The repo-local artifact cache root (``<repo>/.cache``).

Fixture stores, bucketed/partitioned layouts, the IVF index, the
near-dup edge table, and the synthesized corpus all live under one
root. This helper is the ONLY place that computes it — the previous
hand-rolled ``dirname(dirname(dirname(__file__)))`` copies meant a
module moving one directory level would silently write its fixtures
somewhere new. (``operators/_cache.py`` is unrelated: that is the
eager-persist registry, not a filesystem path.)
"""

from __future__ import annotations

import os

__all__ = ["cache_root"]

_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache")


def cache_root(*subdirs: str) -> str:
    """``<repo>/.cache[/sub/dirs]`` (not created — callers mkdir as
    part of their own write-once protocol)."""
    return os.path.join(_ROOT, *subdirs)
