"""
mfpx output (molsys-compatible).

Behavior parity with amof/files/molsys.py:44-90: same header lines
('# type xyz', '# cellvect ...'), same per-atom body layout (1-based
index, element, coordinates, atype, fragtype, fragnumber, 1-based
connectivity), so files remain readable by MOFplus/molsys.
"""

from __future__ import annotations

import numpy as np

import amof_tpu.files.path as ampath


class DummyMol:
    """Minimal molsys-like container for mfpx writing."""

    def __init__(self, elems, xyz, cell, conn, atypes, fragtypes, fragnumbers):
        self.cell = np.asarray(cell, dtype=np.float64)
        self.fragtypes = fragtypes
        self.fragnumbers = fragnumbers
        self.elems = elems
        self.xyz = np.asarray(xyz, dtype=np.float64)
        self.conn = conn
        self.natoms = len(elems)
        self.atypes = atypes


def write_mfpx(mol, filename):
    """Write an mfpx file for a DummyMol-like object."""
    filename = ampath.append_suffix(filename, "mfpx")
    with open(filename, "w") as f:
        f.write("# type xyz\n")
        f.write(
            "# cellvect %12.6f %12.6f %12.6f %12.6f %12.6f %12.6f %12.6f %12.6f %12.6f\n"
            % tuple(mol.cell.ravel())
        )
        f.write("%i\n" % mol.natoms)
        xyz = mol.xyz.tolist()
        for i in range(mol.natoms):
            line = ("%3d %-3s" + 3 * "%12.6f" + "   %-24s") % (
                i + 1, mol.elems[i], xyz[i][0], xyz[i][1], xyz[i][2],
                mol.atypes[i],
            )
            line += ("%-16s %5d ") % (mol.fragtypes[i], mol.fragnumbers[i])
            conn = (np.array(mol.conn[i], dtype=np.int64) + 1).tolist()
            if len(conn) != 0:
                line += (len(conn) * "%7d ") % tuple(conn)
            f.write("%s \n" % line)
