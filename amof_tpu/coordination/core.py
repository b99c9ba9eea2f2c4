"""
Chemistry-rule-driven bond detection and graph coarse-graining.

Re-implementation of the reference's coordination-search framework
(amof/coordination/core.py) on amof_tpu Frames — no pymatgen, no
networkx on the load-bearing path:

  * fragment bookkeeping (create/add/merge/renumber, :71-145),
  * ``reduce_structure``: one site per fragment at its PBC center of
    mass, inferred inter-fragment cutoffs, connectivity-consistency
    check (:147-195) with the same report_search keys,
  * bounded pattern-cycle search (``find_rings``, :337-453) including
    greedy overlap removal — implemented as an index-ordered DFS
    enumeration instead of nx.simple_cycles on a doubled digraph,
  * greedy global nearest-pair assignment
    (``assign_B_uniquely_to_A_N_coordinated``, :488-604),
  * independent per-atom nearest-N search (``find_N_closest_cov_dist``,
    :612-698),
  * atype strings (:227-238), covalent-radius criteria (:240-244),
  * ``SearchError`` carrying the report (:30-40), mfpx export (:197).

Neighbor data comes from the shared periodic pair engine
(amof_tpu.ops.neighbors_host on host for these small per-frame graphs).
"""

from __future__ import annotations

import logging
from collections import Counter, namedtuple
from copy import deepcopy
from typing import Callable, Dict, List, Optional

import numpy as np
from scipy import stats

import amof_tpu.files.molsys as ammolsys
import amof_tpu.structure
import amof_tpu.symbols
from amof_tpu.core.frames import Frame
from amof_tpu.data import elements
from amof_tpu.ops.neighbors_host import neighbor_pairs

logger = logging.getLogger(__name__)

Neighbor = namedtuple("Neighbor", ["index", "nn_distance"])


class SearchError(Exception):
    """Raised when a coordination search fails; carries the search
    report for the frame-drop bookkeeping."""

    def __init__(self, message, report_search=None):
        super().__init__(message)
        self.message = message
        self.report_search = report_search if report_search is not None else {}


class CoordinationSearch:
    """General coordination-search machinery; actual searches live in
    system-specific subclasses (amof_tpu.coordination.zif)."""

    covalentradius = elements.covalent_radii  # symbol -> radius (Å)

    def __init__(self, frame: Frame, neighb_max_distance, dist_margin):
        self.frame = frame
        n = len(frame)
        self.conn: List[List[int]] = [[] for _ in range(n)]
        self.atypes = ["" for _ in range(n)]
        self.fragtypes = ["-1" for _ in range(n)]
        self.fragnumbers = [-1 for _ in range(n)]
        self.elems = [s.lower() for s in frame.get_chemical_symbols()]
        self.fragments: Dict[int, dict] = {}
        self.symbols = amof_tpu.symbols.DummySymbols()
        self.all_neighb = self._build_all_neighb(neighb_max_distance)
        self.dist_margin = dist_margin
        self.report_search = {"number_of_atoms": n}

    # -- neighbor substrate --------------------------------------------------
    def _build_all_neighb(self, max_distance):
        i_idx, j_idx, dists, _ = neighbor_pairs(
            self.frame.get_positions(), self.frame.get_cell(),
            self.frame.pbc, float(max_distance),
            species=None,
        )
        all_neighb = [[] for _ in range(len(self.frame))]
        for i, j, d in zip(i_idx, j_idx, dists):
            all_neighb[i].append(Neighbor(int(j), float(d)))
        # deterministic regardless of the pair-search backend's output
        # order: greedy tie-breaks downstream must not depend on it
        for lst in all_neighb:
            lst.sort(key=lambda nb: (nb.nn_distance, nb.index))
        return all_neighb

    # -- fragment bookkeeping --------------------------------------------------
    def in_fragment(self, index):
        return self.fragnumbers[index] != -1

    def create_fragment(self, fragtype, indices, fragnumber="auto"):
        if fragnumber == "auto":
            fragnumber = (
                0 if len(self.fragments) == 0 else max(self.fragments) + 1
            )
        indices = list(set(indices))
        self.fragments[fragnumber] = {
            "fragnumber": fragnumber, "fragtype": fragtype, "indices": indices,
        }
        for i in indices:
            self.fragtypes[i] = fragtype
            self.fragnumbers[i] = fragnumber

    def add_to_fragment(self, fragnumber, indices):
        fragtype = self.fragments[fragnumber]["fragtype"]
        for i in indices:
            self.fragtypes[i] = fragtype
            self.fragnumbers[i] = fragnumber
        self.fragments[fragnumber]["indices"] = list(
            set(self.fragments[fragnumber]["indices"] + indices)
        )

    def merge_fragments(self, fragnumber, fragnumber_to_absorb):
        self.add_to_fragment(
            fragnumber, self.fragments[fragnumber_to_absorb]["indices"]
        )
        self.fragments.pop(fragnumber_to_absorb)

    def change_fragnumber(self, fragnumber_old, fragnumber_new):
        if fragnumber_new in self.fragments:
            raise SearchError(
                "Cannot change fragnumber: not empty in fragment",
                self.report_search,
            )
        fragment = self.fragments.pop(fragnumber_old)
        self.create_fragment(
            fragment["fragtype"], fragment["indices"], fragnumber=fragnumber_new
        )

    def clean_fragments(self):
        """Drop empty fragments and renumber to remove gaps."""
        for fragnumber in [
            k for k, v in self.fragments.items() if len(v["indices"]) == 0
        ]:
            self.fragments.pop(fragnumber)
        fragnumbers_old = list(self.fragments.keys())
        for i, old in enumerate(fragnumbers_old):
            if i != old:
                self.change_fragnumber(old, i)

    # -- coarse graining ---------------------------------------------------
    def make_frag_conn(self):
        """Fragment-level connectivity from atom-level conn."""
        self.frag_conn = [[] for _ in range(len(self.fragments))]
        self.frag_conn_atoms = [[] for _ in range(len(self.fragments))]
        for i, fragment in self.fragments.items():
            for ia in fragment["indices"]:
                for ja in self.conn[ia]:
                    j = self.fragnumbers[ja]
                    if i != j:
                        self.frag_conn[i].append(j)
                        self.frag_conn_atoms[i].append((ia, ja))

    def reduce_structure(self):
        """Collapse fragments to single sites at their PBC centers of
        mass; infer inter-fragment cutoffs; verify that the fragment
        connectivity is reconstructible from those cutoffs."""
        self.make_frag_conn()
        list_symbols = list(set(self.fragtypes))
        if "-1" in list_symbols:
            list_symbols.remove("-1")
        self.symbols.add_names(list_symbols)
        n_frag = len(self.fragments)
        species = [""] * n_frag
        coords = np.zeros((n_frag, 3))
        for fragnumber, fragment in self.fragments.items():
            species[fragnumber] = self.symbols.get_symbol(fragment["fragtype"])
            coords[fragnumber] = amof_tpu.structure.get_center_of_mass(
                self.frame, fragment["indices"]
            )
        numbers = [elements.atomic_numbers[s] for s in species]
        reduced = Frame(coords, numbers, self.frame.get_cell(), pbc=True)
        reduced.wrap()

        # inferred cutoffs from actual bonded fragment distances
        list_of_nb = sorted(
            {
                tuple(sorted((i, j)))
                for i in range(len(self.frag_conn))
                for j in self.frag_conn[i]
            }
        )
        from amof_tpu.core.cellmath import min_image_distance

        bonds = np.array(
            ["-".join(sorted([species[i], species[j]])) for i, j in list_of_nb]
        )
        distances = np.array(
            [
                min_image_distance(
                    reduced.positions[i], reduced.positions[j], reduced.cell
                )
                for i, j in list_of_nb
            ]
        )
        nb_set_and_cutoff = {}
        for nb_set in sorted(set(bonds)):
            nb_set_and_cutoff[str(nb_set)] = float(
                np.max(distances[bonds == nb_set])
            )
        self.report_search["nb_set_and_cutoff"] = str(nb_set_and_cutoff)

        # consistency: every pair within its cutoff must be frag-bonded
        irregular_nb = []
        irregular_nb_offset = []
        if nb_set_and_cutoff:
            i_idx, j_idx, dists, _ = neighbor_pairs(
                reduced.get_positions(), reduced.get_cell(), True,
                max(nb_set_and_cutoff.values()),
            )
            for i, j, distance in zip(i_idx, j_idx, dists):
                nb_set = "-".join(sorted([species[i], species[j]]))
                if (
                    nb_set in nb_set_and_cutoff
                    and j not in self.frag_conn[i]
                    and distance < nb_set_and_cutoff[nb_set]
                ):
                    irregular_nb.append(nb_set)
                    irregular_nb_offset.append(
                        nb_set_and_cutoff[nb_set] - distance
                    )
        self.report_search["connectivity_constructible_with_cutoffs"] = (
            len(irregular_nb) == 0
        )
        if irregular_nb:
            self.report_search["connectivity_wrongly_inferred_from_cutoffs"] = str(
                dict(Counter(irregular_nb).items())
            )
            self.report_search["connectivity_wrong_offsets"] = str(
                stats.describe(irregular_nb_offset)
            )
        self.report_search["number_of_nodes"] = len(reduced)
        self.report_search["symbols"] = str(self.symbols)
        return reduced

    def write_mfpx(self, filename):
        """Write an mfpx file with connectivity readable by molsys."""
        mol = ammolsys.DummyMol(
            self.elems, self.frame.positions, self.frame.cell,
            self.conn, self.atypes, self.fragtypes, self.fragnumbers,
        )
        ammolsys.write_mfpx(mol, filename)

    # -- atype / covalent helpers -----------------------------------------
    def get_atype(self, i):
        """molsys-style atom type: elem + degree + sorted nn composition."""
        atype = self.elems[i] + str(len(self.conn[i]))
        counts = Counter(self.elems[j] for j in self.conn[i])
        list_of_counts = sorted(counts.items(), key=lambda t: (t[0], t[1]))
        atype += "_" + "".join(str(e) for pair in list_of_counts for e in pair)
        return atype

    def update_atypes(self):
        self.atypes = [self.get_atype(i) for i in range(len(self.frame))]

    def get_covdist(self, i, j):
        """Sum of covalent radii of atoms i and j."""
        return (
            self.covalentradius[self.elems[i].title()]
            + self.covalentradius[self.elems[j].title()]
        )

    def get_neighb_cov_dist(self, i, dist_margin=None):
        """Neighbors of i within dist_margin x covalent distance."""
        if dist_margin is None:
            dist_margin = self.dist_margin
        return [
            n for n in self.all_neighb[i]
            if n.nn_distance < dist_margin * self.get_covdist(i, n.index)
        ]

    def get_A_Bbonds(self, A, B):
        """Per-atom count of B neighbors in conn for A atoms (-1 else)."""
        out = [-1 for _ in range(len(self.frame))]
        for i in range(len(self.frame)):
            if self.elems[i] == A:
                out[i] = sum(1 for j in self.conn[i] if self.elems[j] == B)
        return out

    def clean_conn(self):
        for i in range(len(self.conn)):
            self.conn[i] = list(set(self.conn[i]))

    # -- bonded-graph construction + cycle search ---------------------------
    def add_ABbonds(self, graph, A, B, dist_margin=None):
        """Add A-B bonds to an adjacency-set graph in place under the
        covalent-distance criterion (parity:
        amof/coordination/core.py:246-262, which mutates a pymatgen
        StructureGraph; here the graph is a list of neighbor sets)."""
        if dist_margin is None:
            dist_margin = self.dist_margin
        for i in range(len(self.frame)):
            if self.elems[i] != A:
                continue
            for nb in self.all_neighb[i]:
                j = nb.index
                if (
                    self.elems[j] == B
                    and nb.nn_distance
                    < dist_margin * self.get_covdist(i, j)
                ):
                    graph[i].add(j)
                    graph[j].add(i)

    def species_bond_graph(self, pairs, dist_margin=None):
        """Adjacency sets for bonds between the given species pairs
        (a fresh add_ABbonds graph for several pairs at once)."""
        adj = [set() for _ in range(len(self.frame))]
        for A, B in pairs:
            self.add_ABbonds(adj, A, B, dist_margin)
        return adj

    @staticmethod
    def are_circularly_identical(arr1, arr2):
        """Whether two sequences are equal up to rotation (one
        direction), the matching used for pattern cycles."""
        if len(arr1) != len(arr2):
            return False
        str1 = " ".join(map(str, arr1))
        str2 = " ".join(map(str, arr2))
        if len(str1) != len(str2):
            return False
        return str1 in str2 + " " + str2

    @staticmethod
    def _simple_cycles_bounded(adj, length, max_length=None):
        """Enumerate simple cycles by index-ordered DFS: each cycle is
        produced exactly once, anchored at its minimum node. If
        ``length`` is None, all cycles with 2 < len <= max_length."""
        n = len(adj)
        cycles = []
        limit = length or max_length
        for v0 in range(n):
            # DFS paths starting at v0 using only nodes > v0
            stack = [(v0, [v0], {v0})]
            while stack:
                u, path, onpath = stack.pop()
                for w in adj[u]:
                    if w == v0 and len(path) > 2:
                        if length is None or len(path) == length:
                            # avoid double counting (each cycle found in
                            # both directions): canonical direction only
                            if path[1] < path[-1]:
                                cycles.append(list(path))
                    elif w > v0 and w not in onpath and len(path) < limit:
                        stack.append((w, path + [w], onpath | {w}))
        return cycles

    @staticmethod
    def _has_cycle_longer_than(adj, k):
        """Whether any simple cycle has length > k (early-exit DFS over
        the same index-ordered enumeration as _simple_cycles_bounded,
        but unbounded in depth)."""
        n = len(adj)
        for v0 in range(n):
            stack = [(v0, [v0], {v0})]
            while stack:
                u, path, onpath = stack.pop()
                for w in adj[u]:
                    if w == v0 and len(path) > max(2, k):
                        return True
                    if w > v0 and w not in onpath:
                        stack.append((w, path + [w], onpath | {w}))
        return False

    def find_rings(self, graph, including=None, max_depth=None,
                   exit_if_large_cycle=False, pattern=None,
                   target_number_of_rings=None, exit_if_too_many_rings=False,
                   remove_overlapping_rings=False):
        """Cycle search on a bonded graph (semantics of
        amof/coordination/core.py:337-453).

        Args:
            graph: adjacency sets (from species_bond_graph).
            max_depth: keep cycles with 2 < len <= max_depth.
            pattern: list of species strings; keep cycles of exactly that
                length whose element sequence circularly matches.
            remove_overlapping_rings: greedily drop max-overlap rings
                until every atom belongs to at most one ring.

        Returns:
            list of cycles as edge lists [(prev, node), ...].
        """
        if pattern is not None:
            raw = self._simple_cycles_bounded(graph, len(pattern))
            all_cycles = []
            for c in raw:
                c_pattern = [self.elems[i] for i in c]
                if self.are_circularly_identical(
                    c_pattern, pattern
                ) or self.are_circularly_identical(c_pattern[::-1], pattern):
                    all_cycles.append(c)
                if (
                    exit_if_too_many_rings
                    and target_number_of_rings is not None
                    and len(all_cycles) > target_number_of_rings * 2
                ):
                    raise SearchError(
                        "target_number_of_rings exceeded in pattern cycle search",
                        self.report_search,
                    )
        elif max_depth is not None:
            all_cycles = self._simple_cycles_bounded(
                graph, None, max_length=max_depth
            )
            if exit_if_large_cycle:
                # the reference raises on ANY simple cycle larger than
                # max_depth (amof/coordination/core.py:379-384 checks the
                # full nx.simple_cycles enumeration), so the check must be
                # unbounded — a graph whose smallest over-limit cycle has
                # length >= max_depth+2 must still raise
                if self._has_cycle_longer_than(graph, max_depth):
                    raise SearchError(
                        "max_depth exceeded in cycle search", self.report_search
                    )
        else:
            raise ValueError("specify max_depth or pattern")

        unique_cycles = all_cycles  # DFS enumeration is already unique

        if (
            target_number_of_rings is not None
            and len(unique_cycles) > target_number_of_rings
        ):
            self.report_search["Extra cycles found after initial ring search"] = (
                len(unique_cycles) - target_number_of_rings
            )

        if (
            remove_overlapping_rings
            and target_number_of_rings is not None
            and len(unique_cycles) > target_number_of_rings
        ):
            def cycles_of_atom(cycles):
                out = [[] for _ in range(len(self.frame))]
                for ci, c in enumerate(cycles):
                    for a in c:
                        out[a].append(ci)
                return out

            removed = 0
            per_atom = cycles_of_atom(unique_cycles)
            while unique_cycles and max(len(c) for c in per_atom) > 1:
                weights = [
                    sum(len(per_atom[a]) for a in c) for c in unique_cycles
                ]
                max_w = max(weights)
                drop = [i for i, w in enumerate(weights) if w == max_w]
                removed += len(drop)
                for index in sorted(drop, reverse=True):
                    del unique_cycles[index]
                per_atom = cycles_of_atom(unique_cycles)
            self.report_search["Overlapping rings removed"] = removed

        if including is not None:
            unique_cycles = [
                c for c in unique_cycles if any(i in c for i in including)
            ]

        cycles_edges = []
        for cycle in unique_cycles:
            cycles_edges.append(
                [(cycle[i - 1], e) for i, e in enumerate(cycle)]
            )
        return cycles_edges

    # -- generic cycle helpers (API parity; host-side conveniences) --------
    def find_one_cycle_per_node(self, graph):
        """One DFS cycle per node where possible
        (parity: amof/coordination/core.py:290-314)."""
        import networkx as nx

        G = nx.Graph()
        G.add_nodes_from(range(len(graph)))
        for u, nbrs in enumerate(graph):
            for v in nbrs:
                G.add_edge(u, v)
        cycles_list = []
        node_in_cycle = {i: False for i in G.nodes}
        for i in list(G.nodes):
            if not node_in_cycle[i]:
                try:
                    cycle = nx.find_cycle(G, i)
                    cycle_nodes = {a for e in cycle for a in e}
                    if i in cycle_nodes:
                        for j in cycle_nodes:
                            node_in_cycle[j] = True
                        cycles_list.append(cycle)
                except nx.exception.NetworkXNoCycle:
                    pass
        return cycles_list

    @staticmethod
    def get_chain_decomposition(graph):
        """Chain decomposition (parity: amof/coordination/core.py:279-288)."""
        import networkx as nx
        from networkx.algorithms.chains import chain_decomposition

        G = nx.Graph()
        G.add_nodes_from(range(len(graph)))
        for u, nbrs in enumerate(graph):
            for v in nbrs:
                G.add_edge(u, v)
        return list(chain_decomposition(G))

    def plot_conn_as_graph(self, filename="graph_temp.png"):
        """Draw the current connectivity to a png (debugging aid,
        parity: amof/coordination/core.py:462-470)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import networkx as nx

        import amof_tpu.files.path

        filename = str(amof_tpu.files.path.append_suffix(filename, "png"))
        G = nx.Graph()
        G.add_nodes_from(range(len(self.frame)))
        for i in range(len(self.frame)):
            for j in self.conn[i]:
                G.add_edge(i, j)
        plt.figure(figsize=(8, 8))
        nx.draw_spring(G, node_size=30, with_labels=False)
        plt.savefig(filename, dpi=150)
        plt.close()
        return G

    # -- assignment procedures ----------------------------------------------
    def assign_B_uniquely_to_A_N_coordinated(
        self, conditionA: Callable[[int], bool],
        conditionB: Callable[[int], bool], target_N: int,
        use_cov_dist=True, dist_margin=None, report_level=None,
        report_entry=None, propagate_fragments=False,
        new_fragments_name=None,
    ):
        """Greedily bond the globally closest (A, B) pairs until every A
        is target_N coordinated or runs out of candidates; each B is
        assigned at most once (amof/coordination/core.py:488-604)."""
        if dist_margin is None:
            dist_margin = self.dist_margin

        A_indices, A_neighb_indices, A_nn_distances = [], [], []
        A_conn, A_enough_nn, A_new_nb = [], [], []
        for i in range(len(self.frame)):
            if not conditionA(i):
                continue
            A_indices.append(i)
            A_conn.append(deepcopy(self.conn[i]))
            A_new_nb.append([])
            neighb_set = [n for n in self.all_neighb[i] if conditionB(n.index)]
            if use_cov_dist:
                neighb_set = [
                    n for n in neighb_set
                    if n.nn_distance < dist_margin * self.get_covdist(i, n.index)
                ]
            neighb_set.sort(key=lambda n: n.nn_distance)
            A_neighb_indices.append([n.index for n in neighb_set])
            A_nn_distances.append([n.nn_distance for n in neighb_set])
            A_enough_nn.append(
                not (len(A_conn[-1]) < target_N and len(neighb_set) == 0)
            )

        def done():
            return all(
                len(A_conn[i]) >= target_N or not A_enough_nn[i]
                for i in range(len(A_indices))
            )

        while not done():
            best, imin = np.inf, -1
            for i in range(len(A_indices)):
                if len(A_conn[i]) >= target_N or not A_enough_nn[i]:
                    continue
                if A_nn_distances[i] and A_nn_distances[i][0] < best:
                    best, imin = A_nn_distances[i][0], i
            if imin < 0:
                break
            b_imin = A_neighb_indices[imin][0]
            A_conn[imin].append(b_imin)
            A_new_nb[imin].append(b_imin)
            for i in range(len(A_indices)):
                while b_imin in A_neighb_indices[i]:
                    pos = A_neighb_indices[i].index(b_imin)
                    A_neighb_indices[i].pop(pos)
                    A_nn_distances[i].pop(pos)
            for i in range(len(A_indices)):
                if A_enough_nn[i] and len(A_nn_distances[i]) == 0:
                    A_enough_nn[i] = False

        for i, a in enumerate(A_indices):
            self.conn[a] = A_conn[i]
            for nmem in A_conn[i]:
                if a not in self.conn[nmem]:
                    self.conn[nmem].append(a)

        if report_level == "full":
            list_of_atypes = [
                self.get_atype(i) for i in range(len(self.frame))
                if conditionA(i)
            ]
            self.report_search[report_entry] = Counter(
                list_of_atypes
            ).most_common()
            if self.report_search[report_entry]:
                logger.debug("%s: %s", report_entry,
                             self.report_search[report_entry])
        if report_level == "undercoordinated":
            list_of_atypes = [
                self.get_atype(A_indices[i]) for i in range(len(A_indices))
                if len(A_conn[i]) != target_N
            ]
            self.report_search[report_entry] = Counter(
                list_of_atypes
            ).most_common()
            if self.report_search[report_entry]:
                logger.debug("%s: %s", report_entry,
                             self.report_search[report_entry])

        if new_fragments_name is not None:
            for a in A_indices:
                if not self.in_fragment(a):
                    self.create_fragment(new_fragments_name, [a])
        if propagate_fragments:
            for i, a in enumerate(A_indices):
                if self.in_fragment(a):
                    for b in A_new_nb[i]:
                        if not self.in_fragment(b):
                            self.add_to_fragment(self.fragnumbers[a], [b])
                        elif self.fragnumbers[b] != self.fragnumbers[a]:
                            self.merge_fragments(
                                self.fragnumbers[a], self.fragnumbers[b]
                            )

    def find_N_closest_cov_dist(
        self, conditionA, conditionB, target_N, dist_margin=None,
        report_level=None, report_entry=None, propagate_fragments=False,
        new_fragments_name=None,
    ):
        """Independently bond each A to its target_N closest B neighbors
        under the covalent criterion (amof/coordination/core.py:612-698).
        The same B may serve several A atoms."""
        if dist_margin is None:
            dist_margin = self.dist_margin

        list_of_undercoordinated = []
        A_indices, A_new_nb = [], []
        for i in range(len(self.frame)):
            if not conditionA(i):
                continue
            A_indices.append(i)
            new_nb = []
            neighb_set = [
                s for s in self.get_neighb_cov_dist(i, dist_margin)
                if conditionB(s.index)
            ]
            if len(neighb_set) < target_N:
                logger.debug(
                    "not enough nn for %s: %s instead of %s",
                    i, len(neighb_set), target_N,
                )
                list_of_undercoordinated.append(i)
            neighb_set.sort(key=lambda n: n.nn_distance)
            for nn in neighb_set[: min(target_N, len(neighb_set))]:
                new_nb.append(nn.index)
                self.conn[i].append(nn.index)
                self.conn[nn.index].append(i)
            A_new_nb.append(new_nb)

        if report_level == "full":
            list_of_atypes = [
                self.get_atype(i) for i in range(len(self.frame))
                if conditionA(i)
            ]
            self.report_search[report_entry] = Counter(
                list_of_atypes
            ).most_common()
            if self.report_search[report_entry]:
                logger.debug("%s: %s", report_entry,
                             self.report_search[report_entry])
        if report_level == "undercoordinated":
            list_of_atypes = [
                self.get_atype(i) for i in list_of_undercoordinated
            ]
            self.report_search[report_entry] = Counter(
                list_of_atypes
            ).most_common()
            if self.report_search[report_entry]:
                logger.debug("%s: %s", report_entry,
                             self.report_search[report_entry])

        if new_fragments_name is not None:
            for a in A_indices:
                if not self.in_fragment(a):
                    self.create_fragment(new_fragments_name, [a])

        if propagate_fragments is True:
            for i, a in enumerate(A_indices):
                if self.in_fragment(a):
                    for b in A_new_nb[i]:
                        if not self.in_fragment(b):
                            self.add_to_fragment(self.fragnumbers[a], [b])
                        elif self.fragnumbers[b] != self.fragnumbers[a]:
                            self.merge_fragments(
                                self.fragnumbers[a], self.fragnumbers[b]
                            )
        elif propagate_fragments == "reverse":
            if target_N != 1:
                raise SearchError(
                    "Propagation ambiguous: Tried to propagate fragment "
                    "from B to A with target_N not equal to 1",
                    self.report_search,
                )
            for i, a in enumerate(A_indices):
                if len(A_new_nb[i]) == 1:
                    b = A_new_nb[i][0]
                    if not self.in_fragment(a):
                        self.add_to_fragment(self.fragnumbers[b], [a])
                    elif self.fragnumbers[b] != self.fragnumbers[a]:
                        self.merge_fragments(
                            self.fragnumbers[b], self.fragnumbers[a]
                        )


class NotImplementedSearch(CoordinationSearch):
    """Placeholder search for unsupported MOFs
    (parity: amof/coordination/core.py:701-716)."""

    def __init__(self, mof=None):
        self.report_search = {}
        if mof is not None:
            self.report_search["mof"] = mof
        raise SearchError("Structure search not implemented", self.report_search)
