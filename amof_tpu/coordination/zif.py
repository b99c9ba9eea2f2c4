"""
Coordination searches for ZIF glasses.

API and rule parity with amof/coordination/zif.py: ``ZifSearch`` base
(neighbor-distance budget :50-71, C-N-C-N-C cycle finder with sanity
reporting :73-121), ``MetalmIm`` (ZIF-8 rule program :123-221),
``MetalIm`` (ZIF-4 / ZIF-zni / SALEM-2 :223-315), ``MetalCycle``
(generic Zn + C3N2 :319-375) — same default margins (dist_margin 1.2,
dist_margin_metal 1.5, dist_margin_H 1.44 :19-21), the same detect_conn
step sequences and report_search keys, and the same two-symbol validity
criterion.
"""

from __future__ import annotations

import logging

import numpy as np

import amof_tpu.coordination.buildingunits as bu
from amof_tpu.coordination.core import CoordinationSearch, SearchError

logger = logging.getLogger(__name__)


class ZifSearch(CoordinationSearch):
    """Base search for ZIFs: single metal nodes + imid-based linkers."""

    def __init__(self, frame, dist_margin=1.2, dist_margin_metal=1.5,
                 dist_margin_H=1.44, cutoff_metal=None,
                 ignore_H_in_reduction=True):
        """Args:
            dist_margin: covalent-radius tolerance for linker bonds
                (1.2 -> C-C 1.752 Å, C-N 1.728 Å).
            dist_margin_metal: tolerance for metal-X bonds
                (1.5 -> Zn-N (1.22+0.71)*1.5 = 2.895 Å).
            dist_margin_H: tolerance for H-X bonds.
            cutoff_metal: absolute metal cutoff overriding the margin.
            ignore_H_in_reduction: identify imid by its cycle only; H
                misassignments are reported but don't invalidate.
        """
        self.dist_margin_metal = dist_margin_metal
        self.dist_margin_H = dist_margin_H
        self.ignore_H_in_reduction = ignore_H_in_reduction
        neighb_max_distance = self.find_neighb_max_distance(
            dist_margin, dist_margin_metal, dist_margin_H, cutoff_metal
        )
        CoordinationSearch.__init__(
            self, frame, neighb_max_distance, dist_margin
        )
        self.detect_conn()
        self.clean_fragments()
        self.update_atypes()

    def find_neighb_max_distance(self, dist_margin, dist_margin_metal,
                                 dist_margin_H, cutoff_metal):
        """Smallest neighbor-search radius covering every bond criterion
        used by the rule program."""
        linker_species = self.linker.species
        metal_species = self.node.species
        max_cov_linker = np.max([
            self.covalentradius[a] + self.covalentradius[b]
            for a in linker_species for b in linker_species
        ])
        max_cov_H = np.max([
            self.covalentradius["H"] + self.covalentradius[b]
            for b in (linker_species + metal_species)
        ])
        if cutoff_metal is None:
            max_cov_metal = np.max([
                self.covalentradius[a] + self.covalentradius[b]
                for a in metal_species
                for b in (linker_species + metal_species)
            ])
        else:
            max_cov_metal = cutoff_metal
        return max(
            max_cov_linker * dist_margin,
            max_cov_metal * dist_margin_metal,
            max_cov_H * dist_margin_H,
        )

    def find_ABAcycles(self, A, B, cycle_length, target_number_of_cycles,
                       fragtype=None):
        """Find ABAB...A cycles (imid C-N-C-N-C), record their bonds in
        conn, create fragments, and report sanity diagnostics."""
        graph = self.species_bond_graph([(B, A), (A, A)])
        pattern = [A] + [B, A] * int((cycle_length - 1) / 2)
        cycles = self.find_rings(
            graph, pattern=pattern,
            target_number_of_rings=target_number_of_cycles,
            exit_if_too_many_rings=False, remove_overlapping_rings=True,
        )

        report_entry_1 = "Expected number of cycles"
        self.report_search[report_entry_1] = (
            len(cycles) == target_number_of_cycles
        )
        if not self.report_search[report_entry_1]:
            logger.debug("number of cycles incorrect")
            self.report_search["Number of missing cycles"] = (
                target_number_of_cycles - len(cycles)
            )

        report_entry_2 = "Atoms appear only once in cycles"
        in_cycle = [False] * len(self.frame)
        self.report_search[report_entry_2] = True
        for c in cycles:
            for a, b in c:
                self.conn[a].append(b)
                self.conn[b].append(a)
                if in_cycle[a]:
                    logger.debug("atom %s appears in more than one cycle", a)
                    self.report_search[report_entry_2] = False
                in_cycle[a] = True
        self.clean_conn()

        if fragtype is not None:
            for c in cycles:
                indices = list({i for edge in c for i in edge})
                self.create_fragment(fragtype, indices)

        self.report_search["Cycle search successful"] = (
            self.report_search[report_entry_1]
            and self.report_search[report_entry_2]
        )


class MetalmIm(ZifSearch):
    """Metal + mIm (methylimidazolate C4N2H5); supports ZIF-8.

    Steps: CNCNC cycles -> H onto CH/CH3 carbons -> leftover H ->
    CH3-to-ring bond -> N-metal.
    """

    def __init__(self, frame, metal, dist_margin=1.2, dist_margin_metal=1.5,
                 ignore_H_in_reduction=True):
        self.node = bu.SingleMetal(metal, 4)
        self.linker = bu.ImidazoleBased("mIm", "C4N2H5")
        ZifSearch.__init__(
            self, frame, dist_margin=dist_margin,
            dist_margin_metal=dist_margin_metal,
            ignore_H_in_reduction=ignore_H_in_reduction,
        )

    def detect_conn(self):
        self.find_ABAcycles(
            "c", "n", cycle_length=5,
            target_number_of_cycles=self.elems.count("n") / 2,
            fragtype=self.linker.name,
        )
        if not self.report_search["Cycle search successful"]:
            raise SearchError("Cycle search failed", self.report_search)

        H_perfectly_connected = True

        # H onto C with 0 or 1 N bonds (methyl + ring CH)
        new_fragments_name = "methyl"
        report_entry = "C atoms missing H neighbours"
        C_Nbonds = self.get_A_Bbonds("c", "n")
        logger.debug("number of N nn to C atoms")
        for i in range(3):
            logger.debug("%s C atoms have %s N nn", C_Nbonds.count(i), i)
        self.assign_B_uniquely_to_A_N_coordinated(
            lambda i: (C_Nbonds[i] in [0, 1]),
            lambda i: (self.elems[i] == "h"),
            3,
            report_level="undercoordinated", report_entry=report_entry,
            propagate_fragments=True, new_fragments_name=new_fragments_name,
        )
        H_perfectly_connected = (
            H_perfectly_connected and self.report_search[report_entry] == []
        )

        # leftover H to nearest anything
        H_Cbonds = self.get_A_Bbonds("h", "c")
        new_fragments_name = (
            self.linker.name if self.ignore_H_in_reduction else "irregular_H"
        )
        report_entry = "H atoms not bonded to C"
        self.find_N_closest_cov_dist(
            lambda i: H_Cbonds[i] == 0,
            lambda i: True,
            1,
            report_level="full", report_entry=report_entry,
            propagate_fragments=True, new_fragments_name=new_fragments_name,
        )
        H_perfectly_connected = (
            H_perfectly_connected and self.report_search[report_entry] == []
        )
        self.report_search["H perfectly connected"] = H_perfectly_connected

        # CH3 carbon to ring carbon (2 N bonds)
        self.find_N_closest_cov_dist(
            lambda i: C_Nbonds[i] == 0,
            lambda i: C_Nbonds[i] == 2,
            1,
            report_level="undercoordinated",
            report_entry="C in CHn not bonded to any C in imid",
            propagate_fragments="reverse",
        )

        # N to metal
        metal_atom = self.node.name.lower()
        self.assign_B_uniquely_to_A_N_coordinated(
            lambda i: self.elems[i] == metal_atom,
            lambda i: self.elems[i] == "n",
            self.node.target_coordination,
            dist_margin=self.dist_margin_metal,
            report_level="undercoordinated",
            report_entry=f"undercoordinated {self.node.name}",
            new_fragments_name=self.node.name,
        )

    def is_reduced_structure_valid(self):
        """True iff only metal and mIm fragments were found."""
        return len(self.symbols.from_name_to_symbol) == 2


class MetalIm(ZifSearch):
    """Metal + Im (imidazolate C3N2H3); supports ZIF-4, ZIF-zni, SALEM-2.

    Steps: CNCNC cycles -> H onto every C -> leftover H -> N-metal.
    """

    def __init__(self, frame, metal, dist_margin=1.2, dist_margin_metal=1.5,
                 dist_margin_H=1.44, ignore_H_in_reduction=True):
        self.node = bu.SingleMetal(metal, 4)
        self.linker = bu.ImidazoleBased("Im", "C3N2H3")
        ZifSearch.__init__(
            self, frame, dist_margin=dist_margin,
            dist_margin_metal=dist_margin_metal,
            dist_margin_H=dist_margin_H,
            ignore_H_in_reduction=ignore_H_in_reduction,
        )

    def detect_conn(self):
        self.find_ABAcycles(
            "c", "n", cycle_length=5,
            target_number_of_cycles=self.elems.count("n") / 2,
            fragtype=self.linker.name,
        )
        if not self.report_search["Cycle search successful"]:
            raise SearchError("Cycle search failed", self.report_search)

        H_perfectly_connected = True

        new_fragments_name = (
            self.linker.name if self.ignore_H_in_reduction else "irregular_C"
        )
        report_entry = "C atoms missing H neighbours"
        self.assign_B_uniquely_to_A_N_coordinated(
            lambda i: (self.elems[i] == "c"),
            lambda i: (self.elems[i] == "h"),
            3,
            report_level="undercoordinated", report_entry=report_entry,
            propagate_fragments=True, new_fragments_name=new_fragments_name,
            dist_margin=self.dist_margin_H,
        )
        H_perfectly_connected = (
            H_perfectly_connected and self.report_search[report_entry] == []
        )

        H_Cbonds = self.get_A_Bbonds("h", "c")
        new_fragments_name = (
            self.linker.name if self.ignore_H_in_reduction else "irregular_H"
        )
        report_entry = "H atoms not bonded to C"
        self.find_N_closest_cov_dist(
            lambda i: H_Cbonds[i] == 0,
            lambda i: True,
            1,
            report_level="full", report_entry=report_entry,
            propagate_fragments=True, new_fragments_name=new_fragments_name,
            dist_margin=self.dist_margin_H,
        )
        H_perfectly_connected = (
            H_perfectly_connected and self.report_search[report_entry] == []
        )
        self.report_search["H perfectly connected"] = H_perfectly_connected

        metal_atom = self.node.name.lower()
        self.assign_B_uniquely_to_A_N_coordinated(
            lambda i: self.elems[i] == metal_atom,
            lambda i: self.elems[i] == "n",
            self.node.target_coordination,
            dist_margin=self.dist_margin_metal,
            report_level="undercoordinated",
            report_entry=f"undercoordinated {self.node.name}",
            new_fragments_name=self.node.name,
        )

    def is_reduced_structure_valid(self):
        """True iff only metal and Im fragments were found."""
        return len(self.symbols.from_name_to_symbol) == 2


class MetalCycle(ZifSearch):
    """Generic metal + C3N2 cycle reduction (most ZIFs; atoms outside
    the cycle and metal are ignored)."""

    def __init__(self, frame, metal, dist_margin=1.2, dist_margin_metal=1.5):
        self.node = bu.SingleMetal(metal, 4)
        self.linker = bu.ImidazoleCycle()
        ZifSearch.__init__(
            self, frame, dist_margin=dist_margin,
            dist_margin_metal=dist_margin_metal,
            ignore_H_in_reduction=True,
        )

    def detect_conn(self):
        metal_atom = self.node.name.lower()
        self.find_ABAcycles(
            "c", "n", cycle_length=5,
            target_number_of_cycles=self.elems.count(metal_atom) * 2,
            fragtype=self.linker.name,
        )
        if not self.report_search["Cycle search successful"]:
            raise SearchError("Cycle search failed", self.report_search)

        self.assign_B_uniquely_to_A_N_coordinated(
            lambda i: self.elems[i] == metal_atom,
            lambda i: self.elems[i] == "n",
            self.node.target_coordination,
            dist_margin=self.dist_margin_metal,
            report_level="undercoordinated",
            report_entry=f"undercoordinated {self.node.name}",
            new_fragments_name=self.node.name,
        )

    def is_reduced_structure_valid(self):
        """True iff only metal and ImCycle fragments were found."""
        return len(self.symbols.from_name_to_symbol) == 2
