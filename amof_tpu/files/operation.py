"""
Basic file operations: gzip compress/decompress/concatenate.

Behavior parity: amof/files/operation.py:13-47.
"""

from __future__ import annotations

import gzip
import logging
from pathlib import Path
from shutil import copyfileobj

logger = logging.getLogger(__name__)


def _stream(src, dst) -> None:
    """Copy ``src`` -> ``dst`` (open binary file objects)."""
    with src as f_in, dst as f_out:
        copyfileobj(f_in, f_out)


def compress(filename, remove_if_exists: bool = False) -> None:
    """Gzip ``filename`` to ``filename + '.gz'`` and remove the original.

    If ``remove_if_exists`` and the .gz already exists, only the original
    is removed (same as the reference).
    """
    plain = Path(str(filename))
    packed = plain.with_name(plain.name + ".gz")
    if not (remove_if_exists and packed.exists()):
        logger.info("compress %s", plain)
        _stream(plain.open("rb"), gzip.open(packed, "wb"))
    plain.unlink()


def decompress(filename, remove: bool = True) -> None:
    """Gunzip ``filename + '.gz'`` to ``filename``."""
    plain = Path(str(filename))
    packed = plain.with_name(plain.name + ".gz")
    logger.info("decompress %s", plain)
    _stream(gzip.open(packed, "rb"), plain.open("wb"))
    if remove:
        packed.unlink()


def concatenate(filenames, output_file) -> None:
    """Concatenate ``filenames`` (bytes) into ``output_file``."""
    with open(output_file, "wb") as out:
        for name in filenames:
            with open(name, "rb") as part:
                copyfileobj(part, out)
