"""
CP2K output-file utilities.

Behavior parity: amof/files/cp2k.py (clean_xyz :12-41, clean_tabular
:44-71, read_tabular :74-106) plus the .cell-file parsing embedded in
amof/trajectory.py:208-228.
"""

from __future__ import annotations

import logging
import os
import re

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def clean_xyz(filename):
    """Remove duplicate timesteps from a CP2K xyz output in place.

    Duplicate frames are detected via their ' i = <step>, time =' comment
    line; later duplicates are dropped.
    """
    seen_steps = set()
    tmp = str(filename) + "_temp_rm_duplicates"
    with open(filename, "r") as fr, open(tmp, "w") as fw:
        previous = None
        write_to_file = True
        for line in fr:
            if line[0:5] == " i = ":
                step = int(re.search(" i = (.*), time =(.*)", line).group(1))
                if step not in seen_steps:
                    write_to_file = True
                    seen_steps.add(step)
                else:
                    logger.info("Removing duplicate %s", step)
                    write_to_file = False
            if write_to_file and previous is not None:
                fw.write(previous)
            previous = line
        if write_to_file:
            fw.write(previous)
    os.remove(filename)
    os.rename(tmp, filename)


def clean_tabular(filename):
    """Remove duplicate steps and headers from CP2K tabular output
    (ener / cell / stress files) in place."""
    seen_steps = set()
    tmp = str(filename) + "_temp_rm_duplicates"
    with open(filename, "r") as fr, open(tmp, "w") as fw:
        fw.write(fr.readline())  # header of the first file
        write_to_file = True
        for line in fr:
            if line[0] == "#":
                write_to_file = False
            else:
                step = int(re.split(r"\ +", line)[1])
                if step not in seen_steps:
                    write_to_file = True
                    seen_steps.add(step)
                else:
                    logger.info("Removing duplicate %s", line.strip("\n"))
                    write_to_file = False
            if write_to_file:
                fw.write(line)
    os.remove(filename)
    os.rename(tmp, filename)


def read_tabular(filename, return_units: bool = False):
    """Parse a CP2K tabular file (ener/cell/stress) into a DataFrame
    indexed by Step; optionally also return {column: unit}."""
    with open(filename, "r") as fr:
        first_line = fr.readline().strip("\n")
    columns = re.split(r"\  +", first_line)[1:]
    names, units = [], []
    for c in columns:
        if "Step" in c:
            names.append("Step")
            units.append("")
        else:
            search = re.search(r"(.*)\[(.*)\]", c)
            names.append(search.group(1).strip(".").strip(" "))
            units.append(search.group(2))
    df = pd.read_table(filename, skiprows=1, names=names, sep=r"\s+")
    df = df.set_index("Step")
    if return_units:
        return df, dict(zip(names, units))
    return df


def read_cell_file(path_to_cell, index=None):
    """Read a CP2K .cell file into an array of 3x3 cell matrices.

    Column layout: Step, Time, Ax..Cz (9 values), Volume — the slice
    [2:-1] of each row holds the cell matrix (amof/trajectory.py:218-226).
    """
    cell = np.genfromtxt(path_to_cell)
    if len(cell.shape) == 1:  # single frame
        cell = cell[2:-1]
        if index is not None:
            cell = cell[index]
        return np.array([cell.reshape(3, 3)])
    cell = cell[:, 2:-1]
    if index is not None:
        cell = cell[index]
    return np.array([c.reshape(3, 3) for c in cell])
