"""Coordination-search and building-unit tests: synthetic rule checks +
the full ZIF-4 reduction pipeline (16 Zn + 32 Im expected)."""

import numpy as np
import pytest

import amof_tpu.coordination.reduce as amreduce
import amof_tpu.ring as amring
import amof_tpu.structure
from amof_tpu.coordination.core import CoordinationSearch, SearchError
from amof_tpu.core.frames import Frame


class TestStructureHelpers:
    def test_com_across_boundary(self):
        """Two H atoms straddling the boundary: PBC CoM sits between
        them, near the boundary (not at the cell center)."""
        f = Frame([[9.8, 5, 5], [0.2, 5, 5]], [1, 1], np.eye(3) * 10)
        com = amof_tpu.structure.get_center_of_mass(f, [0, 1])
        assert np.allclose(com, [10.0, 5, 5])

    def test_com_mass_weighted(self):
        f = Frame([[1, 0, 0], [3, 0, 0]], [1, 35], np.eye(3) * 20)  # H, Br
        com = amof_tpu.structure.get_center_of_mass(f, [0, 1])
        assert com[0] > 2.9  # heavily weighted toward Br


def make_search(frame, max_dist=3.5, margin=1.2):
    """Bare CoordinationSearch for unit tests."""
    return CoordinationSearch(frame, max_dist, margin)


class TestCoordinationCore:
    def imid_frame(self):
        """One idealized imidazolate C3N2 ring + 2 H + a Zn, in a box."""
        # regular pentagon of alternating C/N (C at 3 vertices)
        r = 1.32 / (2 * np.sin(np.pi / 5))  # circumradius for bond 1.32
        ang = [2 * np.pi * k / 5 for k in range(5)]
        ring = [[5 + r * np.cos(a), 5 + r * np.sin(a), 5] for a in ang]
        species = [6, 7, 6, 7, 6]  # c n c n c
        # H bonded to C atoms 2 and 4 (outward)
        out = lambda k: [
            5 + (r + 1.0) * np.cos(ang[k]), 5 + (r + 1.0) * np.sin(ang[k]), 5
        ]
        pts = ring + [out(2), out(4)]
        species += [1, 1]
        # Zn near one N
        pts.append([5 + (r + 2.0) * np.cos(ang[1]),
                    5 + (r + 2.0) * np.sin(ang[1]), 5])
        species.append(30)
        return Frame(pts, species, np.eye(3) * 10)

    def test_species_bond_graph_and_pattern_cycles(self):
        f = self.imid_frame()
        s = make_search(f)
        graph = s.species_bond_graph([("n", "c"), ("c", "c")])
        cycles = s.find_rings(
            graph, pattern=["c", "n", "c", "n", "c"],
            target_number_of_rings=1, remove_overlapping_rings=True,
        )
        assert len(cycles) == 1
        nodes = {i for e in cycles[0] for i in e}
        assert nodes == {0, 1, 2, 3, 4}

    def test_assign_unique(self):
        """Two Zn and three N: each Zn gets its nearest N, no N shared."""
        pts = [[2, 5, 5], [8, 5, 5], [3.0, 5, 5], [7.0, 5, 5], [5.0, 5, 5]]
        f = Frame(pts, [30, 30, 7, 7, 7], np.eye(3) * 12)
        s = make_search(f, max_dist=4.0)
        s.assign_B_uniquely_to_A_N_coordinated(
            lambda i: s.elems[i] == "zn",
            lambda i: s.elems[i] == "n",
            2, use_cov_dist=False,
            report_level="undercoordinated", report_entry="under",
        )
        assert sorted(s.conn[0]) == [2, 4]  # Zn0: N at 3.0 and 5.0
        assert sorted(s.conn[1]) == [3]  # Zn1: N at 7.0 (5.0 taken)
        assert s.report_search["under"] != []  # Zn1 undercoordinated

    def test_find_n_closest_shared_allowed(self):
        pts = [[2, 5, 5], [4, 5, 5], [3.0, 5, 5]]
        f = Frame(pts, [30, 30, 7], np.eye(3) * 12)
        s = make_search(f, max_dist=4.0)
        s.find_N_closest_cov_dist(
            lambda i: s.elems[i] == "zn",
            lambda i: s.elems[i] == "n",
            1, dist_margin=2.0,
        )
        assert s.conn[0] == [2] and s.conn[1] == [2]  # shared N

    def test_fragments_lifecycle(self):
        f = Frame(np.random.rand(6, 3) * 5, [6] * 6, np.eye(3) * 10)
        s = make_search(f)
        s.create_fragment("A", [0, 1])
        s.create_fragment("B", [2])
        s.add_to_fragment(1, [3])
        s.merge_fragments(0, 1)
        assert sorted(s.fragments[0]["indices"]) == [0, 1, 2, 3]
        assert s.fragtypes[2] == "A"
        s.clean_fragments()
        assert list(s.fragments.keys()) == [0]

    def test_atype(self):
        f = Frame([[0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]], [6, 7, 1],
                  np.eye(3) * 10)
        s = make_search(f)
        s.conn[0] = [1, 2]
        assert s.get_atype(0) == "c2_h1n1"

    def test_overlap_removal(self):
        """Cycles sharing atoms beyond the target count get removed
        greedily by overlap weight."""
        f = self.imid_frame()
        s = make_search(f)
        # fabricate 3 fake cycles: two disjoint, one overlapping both
        s_frame_n = len(f)
        cycles = [[0, 1, 2], [3, 4, 5], [2, 3, 6]]

        # exercise via find_rings internals: emulate by monkeypatched graph
        # simpler: directly test _simple_cycles_bounded on a known graph
        adj = [set() for _ in range(6)]
        for a, b in [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)]:
            adj[a].add(b)
            adj[b].add(a)
        out = CoordinationSearch._simple_cycles_bounded(adj, None, 5)
        assert sorted(sorted(c) for c in out) == [[0, 1, 2], [2, 3, 4]]

    def test_exit_if_large_cycle_hexagon(self):
        """A graph whose only cycle is a hexagon must raise with
        max_depth=4 — the reference raises on ANY over-limit simple
        cycle, however much larger (ADVICE r1: max_depth+1 probing
        missed cycles of length >= max_depth+2)."""
        f = Frame(np.random.rand(6, 3) * 5, [6] * 6, np.eye(3) * 10)
        s = make_search(f)
        adj = [set() for _ in range(6)]
        for a in range(6):
            adj[a] |= {(a + 1) % 6, (a - 1) % 6}
        with pytest.raises(SearchError, match="max_depth exceeded"):
            s.find_rings(adj, max_depth=4, exit_if_large_cycle=True)
        # triangles only: no over-limit cycle, must not raise
        adj3 = [set() for _ in range(6)]
        for a, b in [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]:
            adj3[a].add(b)
            adj3[b].add(a)
        out = s.find_rings(adj3, max_depth=4, exit_if_large_cycle=True)
        assert len(out) == 2


class TestZifReduction:
    def test_zif4_full_reduction(self, zif4_frame):
        rt = amreduce.reduce_trajectory([zif4_frame], "ZIF-4")
        rs = rt.report_search
        assert len(rt.trajectory) == 1
        assert bool(rs["in_reduced_trajectory"].iloc[0])
        assert bool(rs["is_reduced_structure_valid"].iloc[0])
        assert bool(rs["Cycle search successful"].iloc[0])
        assert bool(rs["H perfectly connected"].iloc[0])
        assert rs["number_of_nodes"].iloc[0] == 48  # 16 Zn + 32 Im
        reduced = rt.trajectory[0]
        symbols = reduced.get_chemical_symbols()
        assert symbols.count("Zn") == 16
        assert symbols.count(rt.symbols.get_symbol("Im")) == 32
        # crystal: inferred cutoffs reconstruct connectivity
        assert bool(rs["connectivity_constructible_with_cutoffs"].iloc[0])

    def test_zif4_zncycle_reduction(self, zif4_frame):
        rt = amreduce.reduce_trajectory([zif4_frame], "ZnCycle")
        rs = rt.report_search
        assert bool(rs["in_reduced_trajectory"].iloc[0])
        assert rs["number_of_nodes"].iloc[0] == 48

    def test_rings_from_reduced_trajectory(self, zif4_frame):
        rt = amreduce.reduce_trajectory([zif4_frame], "ZIF-4")
        ring = amring.Ring.from_reduced_trajectory(rt, max_search_depth=16)
        arr = ring.data["ring"]
        sizes = arr.get_coord("ring_size")
        # Zn-Im alternating network: all rings have even node counts
        assert len(sizes) > 0
        assert all(s % 2 == 0 for s in sizes)
        # ZIF-4 (cag topology): smallest rings are 4-membered in T-atoms
        # = 8 nodes (4 Zn + 4 Im)
        assert int(sizes.min()) == 8

    def test_unknown_mof(self):
        f = Frame([[0, 0, 0]], [30], np.eye(3) * 5)
        rt = amreduce.reduce_trajectory([f], "UnknownMOF-1")
        assert len(rt.trajectory) == 0
        assert not rt.report_search["in_reduced_trajectory"].iloc[0]
        assert "Error_message" in rt.report_search.columns

    def test_roundtrip_files(self, tmp_path, zif4_frame):
        rt = amreduce.reduce_trajectory(
            [zif4_frame], "ZIF-4", filename=str(tmp_path / "red")
        )
        import amof_tpu.trajectory as amtraj

        back = amtraj.ReducedTrajectory.from_file(str(tmp_path / "red"))
        assert len(back.trajectory) == 1
        assert back.symbols.get_name(rt.symbols.get_symbol("Im")) == "Im"
        assert bool(back.report_search["in_reduced_trajectory"].iloc[0])

    def test_mfpx_output(self, tmp_path, zif4_frame):
        amreduce.reduce_trajectory(
            [zif4_frame], "ZIF-4", filename=str(tmp_path / "red"),
            write_mfpx=True,
        )
        mfpx = tmp_path / "red_0.mfpx"
        assert mfpx.exists()
        lines = mfpx.read_text().splitlines()
        assert lines[0] == "# type xyz"
        assert lines[2] == "272"
        assert "zn" in lines[3 + 271].split()[1] or any(
            "zn" in ln.split()[1] for ln in lines[3:]
        )


class TestMetalmIm:
    def mim_frame(self):
        """One idealized methylimidazolate (mIm, C4N2H5) ligand + Zn:
        C3N2 pentagon, methyl C on the 2-position carbon with 3 H,
        ring H on the other two carbons, Zn near one N."""
        bond = 1.35
        r = bond / (2 * np.sin(np.pi / 5))
        center = np.array([7.0, 7.0, 7.0])
        ang = [2 * np.pi * k / 5 for k in range(5)]
        # ring order c0-n1-c2-n3-c4 (c2 sits between both N)
        ring = [center + r * np.array([np.cos(a), np.sin(a), 0]) for a in ang]
        species = [6, 7, 6, 7, 6]
        pts = list(ring)

        def outward(k, dist, dz=0.0):
            return center + (r + dist) * np.array(
                [np.cos(ang[k]), np.sin(ang[k]), 0]
            ) + np.array([0, 0, dz])

        # methyl C on c2 + its 3 H
        c_me = outward(2, 1.5)
        pts.append(c_me)
        species.append(6)
        for dz, dphi in [(0.9, 0.0), (-0.45, 0.5), (-0.45, -0.5)]:
            pts.append(c_me + np.array([0.9 * np.cos(dphi), 0.9 * np.sin(dphi), dz]) * 0.9)
            species.append(1)
        # ring H on c0 and c4
        pts.append(outward(0, 1.0))
        species.append(1)
        pts.append(outward(4, 1.0))
        species.append(1)
        # Zn near n1
        pts.append(outward(1, 2.0))
        species.append(30)
        return Frame(pts, species, np.eye(3) * 14.0)

    def test_mim_reduction(self):
        f = self.mim_frame()
        rt = amreduce.reduce_trajectory([f], "ZIF-8")
        rs = rt.report_search
        assert bool(rs["in_reduced_trajectory"].iloc[0]), rs.iloc[0].to_dict()
        assert rs["number_of_nodes"].iloc[0] == 2  # Zn + one mIm
        reduced = rt.trajectory[0]
        syms = reduced.get_chemical_symbols()
        assert syms.count("Zn") == 1
        assert syms.count(rt.symbols.get_symbol("mIm")) == 1
        assert bool(rs["H perfectly connected"].iloc[0])


class TestSupercellScale:
    def test_2x2x2_supercell_reduction(self, zif4_frame):
        """The cell-list neighbor path (n >= 1500) must reproduce the
        crystal's building-unit census on a 2176-atom ZIF-4 supercell:
        8 cells x (16 Zn + 32 Im) = 384 coarse-grained nodes."""
        import amof_tpu.coordination.reduce as amred
        from amof_tpu.core.frames import Frame

        f = zif4_frame
        pos, nums = [], []
        for i in range(2):
            for j in range(2):
                for k in range(2):
                    shift = i * f.cell[0] + j * f.cell[1] + k * f.cell[2]
                    pos.append(f.positions + shift)
                    nums.append(f.numbers)
        big = Frame(np.concatenate(pos), np.concatenate(nums), f.cell * 2)
        rt = amred.reduce_trajectory([big], "ZIF-4", write_to_file=False)
        assert bool(rt.report_search["in_reduced_trajectory"].iloc[0])
        assert len(rt.trajectory[0]) == 8 * 48
        symbols = rt.trajectory[0].get_chemical_symbols()
        assert symbols.count("Zn") == 8 * 16
