"""
Suffix-enforcing path handling (behavior parity: amof/files/path.py:7-22).
"""

from __future__ import annotations

import pathlib


def append_suffix(path, suffix):
    """Append ``suffix`` to ``path`` unless it is already the final suffix.

    Args:
        path: pathlib.Path or string.
        suffix: string; a leading '.' is added if missing.

    Returns:
        pathlib.Path
    """
    if len(suffix) != 0 and suffix[0] != ".":
        suffix = "." + suffix
    path = pathlib.Path(path)
    if path.suffix != suffix:
        path = path.parent / (path.name + suffix)
    return path
