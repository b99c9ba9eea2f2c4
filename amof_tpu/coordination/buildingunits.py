"""
Building-unit descriptors: nodes and linkers.

API parity with amof/coordination/buildingunits.py — the same small
class hierarchy naming metal nodes and imidazole-based linkers.
"""

from __future__ import annotations


class BuildingUnit:
    """Abstract building unit (node or linker)."""


class Node(BuildingUnit):
    """Generic node."""


class SingleMetal(Node):
    """Single-metal node with a target coordination number."""

    def __init__(self, metal, target_coordination):
        self.name = metal
        self.species = [metal]
        self.target_coordination = target_coordination


class Linker(BuildingUnit):
    """Generic linker."""


class ImidazoleBased(Linker):
    """Imidazole-based linker (e.g. Im C3N2H3, mIm C4N2H5)."""

    def __init__(self, name, formula):
        self.name = name
        self.formula = formula
        self.species = ["C", "H", "N"]


class ImidazoleCycle(ImidazoleBased):
    """The bare C3N2 imidazolate cycle as a generic linker."""

    def __init__(self):
        super().__init__("ImCycle", "C3N2")
        self.species = ["C", "N"]
