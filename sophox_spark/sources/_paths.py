"""Shared input-path resolution for the container sources."""

from __future__ import annotations

import glob
import os


def resolve_input_paths(path: str, what: str) -> list[str]:
    """Glob first, literal-path fallback second, loud failure third.

    A literal path containing ``[`` must not be treated as an empty
    character class, and a non-matching pattern must raise instead of
    silently producing zero rows.
    """
    paths = sorted(glob.glob(path))
    if not paths:
        if os.path.exists(path):
            paths = [path]
        else:
            raise FileNotFoundError(f"no {what} files match {path!r}")
    return paths
