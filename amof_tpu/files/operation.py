"""
Basic file operations: gzip compress/decompress/concatenate.

Behavior parity: amof/files/operation.py:13-47.
"""

from __future__ import annotations

import gzip
import logging
import os
import pathlib
import shutil

logger = logging.getLogger(__name__)


def compress(filename, remove_if_exists: bool = False):
    """Gzip ``filename`` to ``filename + '.gz'`` and remove the original.

    If ``remove_if_exists`` and the .gz already exists, only the original
    is removed (same as the reference).
    """
    if not (remove_if_exists and pathlib.Path(str(filename) + ".gz").exists()):
        logger.info("compress %s", filename)
        with open(filename, "rb") as f_in:
            with gzip.open(str(filename) + ".gz", "wb") as f_out:
                shutil.copyfileobj(f_in, f_out)
    os.remove(filename)


def decompress(filename, remove: bool = True):
    """Gunzip ``filename + '.gz'`` to ``filename``."""
    logger.info("decompress %s", filename)
    with gzip.open(str(filename) + ".gz", "rb") as f_in:
        with open(filename, "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
    if remove:
        os.remove(str(filename) + ".gz")


def concatenate(filenames, output_file):
    """Concatenate ``filenames`` (bytes) into ``output_file``."""
    with open(output_file, "wb") as wfd:
        for f in filenames:
            with open(f, "rb") as fd:
                shutil.copyfileobj(fd, wfd)
