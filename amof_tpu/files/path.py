"""
Suffix-enforcing path handling (behavior parity: amof/files/path.py:7-22).
"""

from __future__ import annotations

from pathlib import Path


def append_suffix(path, suffix) -> Path:
    """Append ``suffix`` to ``path`` unless it is already the final suffix.

    Args:
        path: pathlib.Path or string.
        suffix: string; a leading '.' is added if missing.

    Returns:
        pathlib.Path
    """
    dotted = suffix if not suffix or suffix.startswith(".") else f".{suffix}"
    p = Path(path)
    return p if p.suffix == dotted else p.with_name(p.name + dotted)
