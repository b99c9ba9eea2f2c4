"""
LAMMPS file utilities: data-file reader + xyz-dump deduplication.

Behavior parity: amof/files/lammps.py:10-34 (dedup) and
amof/trajectory.py:62-94 (data-file reading with mass -> element
inference via nearest standard atomic weight).
"""

from __future__ import annotations

import bisect
import logging
import os

import numpy as np

from amof_tpu.core.frames import Frame
from amof_tpu.data import elements

logger = logging.getLogger(__name__)


def remove_duplicate_timesteps(filename):
    """Remove duplicate timesteps from a LAMMPS xyz dump in place.

    Frames are keyed by their 'Atoms.' comment line; later duplicates
    (including their preceding atom-count line) are dropped.
    """
    seen_lines = set()
    tmp = str(filename) + "_temp_rm_duplicates"
    with open(filename, "r") as fr, open(tmp, "w") as fw:
        previous = None
        write_to_file = True
        for line in fr:
            if line[0:5] == "Atoms":
                if line not in seen_lines:
                    write_to_file = True
                    seen_lines.add(line)
                else:
                    logger.info("Removing duplicate %s", line.strip("\n"))
                    write_to_file = False
            if write_to_file and previous is not None:
                fw.write(previous)
            previous = line
        if write_to_file:
            fw.write(previous)
    os.remove(filename)
    os.rename(tmp, filename)


def closest_atomic_number(mass: float) -> int:
    """Atomic number whose standard weight is closest to ``mass``.

    Mirrors the bisect-based nearest lookup at amof/trajectory.py:76-94.
    """
    masses = elements.atomic_masses
    order = [m for m in masses[1:]]  # sorted in practice up to transuranics
    # atomic masses are monotonically increasing for Z=1..83; use bisect
    pos = bisect.bisect_left(order, mass)
    if pos == 0:
        return 1
    if pos >= len(order):
        return len(order)
    before, after = order[pos - 1], order[pos]
    if after - mass < mass - before:
        return pos + 1
    return pos


# Columns after the atom id for each supported atom_style.
_STYLE_COLUMNS = {
    "atomic": ("type", "x", "y", "z"),
    "charge": ("type", "q", "x", "y", "z"),
    "full": ("mol", "type", "q", "x", "y", "z"),
    "molecular": ("mol", "type", "x", "y", "z"),
}


def read_lammps_data(filename, atom_style: str = "charge") -> Frame:
    """Read a LAMMPS data file into a Frame.

    Element identity is inferred from the Masses section by nearest
    standard atomic weight (reference semantics,
    amof/trajectory.py:62-74).
    """
    if atom_style not in _STYLE_COLUMNS:
        raise ValueError(f"unsupported atom_style {atom_style!r}")
    cols = _STYLE_COLUMNS[atom_style]

    with open(filename) as f:
        lines = [ln.split("#")[0].rstrip() for ln in f]

    xlo = xhi = ylo = yhi = zlo = zhi = 0.0
    xy = xz = yz = 0.0
    masses = {}
    atoms = []
    section = None
    i = 1  # skip title line
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        tokens = line.split()
        if line.endswith("xlo xhi"):
            xlo, xhi = float(tokens[0]), float(tokens[1])
        elif line.endswith("ylo yhi"):
            ylo, yhi = float(tokens[0]), float(tokens[1])
        elif line.endswith("zlo zhi"):
            zlo, zhi = float(tokens[0]), float(tokens[1])
        elif line.endswith("xy xz yz"):
            xy, xz, yz = float(tokens[0]), float(tokens[1]), float(tokens[2])
        elif tokens[0] in ("Masses", "Atoms", "Velocities", "Bonds", "Angles",
                           "Dihedrals", "Impropers", "Pair", "PairIJ", "Bond",
                           "Angle", "Dihedral", "Improper"):
            section = tokens[0]
        elif section == "Masses" and len(tokens) >= 2 and tokens[0].isdigit():
            masses[int(tokens[0])] = float(tokens[1])
        elif section == "Atoms" and tokens and tokens[0].lstrip("-").isdigit():
            atoms.append(tokens)

    if not atoms:
        raise ValueError(f"no Atoms section found in {filename}")

    type_col = cols.index("type") + 1
    x_col = cols.index("x") + 1
    atoms.sort(key=lambda t: int(t[0]))
    types = np.array([int(t[type_col]) for t in atoms])
    positions = np.array(
        [[float(t[x_col]), float(t[x_col + 1]), float(t[x_col + 2])] for t in atoms]
    )
    numbers = np.array([closest_atomic_number(masses[t]) for t in types])
    cell = np.array([
        [xhi - xlo, 0.0, 0.0],
        [xy, yhi - ylo, 0.0],
        [xz, yz, zhi - zlo],
    ])
    positions -= np.array([xlo, ylo, zlo])
    return Frame(positions, numbers, cell, pbc=True)
