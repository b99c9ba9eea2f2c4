"""
Structure-level helpers.

API parity with amof/structure.py: ``get_center_of_mass(structure,
indices)`` :7-25 — the PBC-aware center of mass of a site selection,
computed in the periodic image closest to the first selected site —
implemented on amof_tpu Frames instead of pymatgen structures.
"""

from __future__ import annotations


from amof_tpu.core import cellmath


def get_center_of_mass(frame, indices):
    """Mass-weighted center of a selection, minimum-imaged relative to
    the first selected site; cartesian coordinates."""
    indices = list(indices)
    ref = indices[0]
    positions = frame.positions
    masses = frame.get_masses()[indices]
    deltas = cellmath.min_image_delta(
        positions[indices] - positions[ref], frame.cell
    )
    com_rel = (masses[:, None] * deltas).sum(axis=0) / masses.sum()
    return com_rel + positions[ref]
