"""Ring-statistics tests: exact censuses on known graphs, a networkx
brute-force primitive-ring oracle on random graphs, device BFS vs host."""

import numpy as np
import pytest

import amof_tpu.ring as amring
from amof_tpu import native
from amof_tpu.core.frames import Frame
from amof_tpu.ops import graph_kernel


def adjacency_from_edges(n, edges):
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    return adj


def nx_primitive_rings(adj, max_size):
    """Independent oracle: enumerate all simple cycles with networkx and
    keep those passing the shortest-path (no shortcut) criterion."""
    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(len(adj)))
    for u, nbrs in enumerate(adj):
        for v in nbrs:
            G.add_edge(u, v)
    dist = dict(nx.all_pairs_shortest_path_length(G))
    out = set()
    for cyc in nx.simple_cycles(G, length_bound=max_size):
        m = len(cyc)
        if m < 3:
            continue
        ok = True
        for i in range(m):
            for j in range(i + 1, m):
                ring_d = min(j - i, m - (j - i))
                if dist[cyc[i]][cyc[j]] < ring_d:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            # canonicalize
            mpos = int(np.argmin(cyc))
            fwd = tuple(cyc[(mpos + k) % m] for k in range(m))
            bwd = tuple(cyc[(mpos - k) % m] for k in range(m))
            out.add(min(fwd, bwd))
    return out


class TestRingCensus:
    def test_hexagon(self):
        adj = adjacency_from_edges(6, [(i, (i + 1) % 6) for i in range(6)])
        rings, undiscovered, king = native.ring_census(adj, 12)
        assert len(rings) == 1 and len(rings[0]) == 6
        assert undiscovered == 0
        assert king == 1

    def test_cube_graph(self):
        """Q3: 6 primitive 4-rings + 4 primitive 6-rings (the "great
        circle" hexagons; verified against the networkx oracle); 8-rings
        all have shortcuts."""
        edges = []
        for v in range(8):
            for b in range(3):
                u = v ^ (1 << b)
                if u > v:
                    edges.append((v, u))
        adj = adjacency_from_edges(8, edges)
        rings, _, _ = native.ring_census(adj, 12)
        sizes = sorted(len(r) for r in rings)
        assert sizes.count(4) == 6
        assert sizes.count(6) == 4
        assert max(sizes) == 6

    def test_two_fused_squares(self):
        """Two squares sharing an edge: both squares are primitive; the
        outer 6-ring has a shortcut through the shared edge."""
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4), (4, 5), (5, 2)]
        adj = adjacency_from_edges(6, edges)
        rings, _, _ = native.ring_census(adj, 12)
        sizes = sorted(len(r) for r in rings)
        assert sizes == [4, 4]

    def test_depth_cap_and_undiscovered(self):
        """A 10-ring is invisible at depth 8 and flags as potentially
        undiscovered; visible at depth 10."""
        adj = adjacency_from_edges(10, [(i, (i + 1) % 10) for i in range(10)])
        rings, undiscovered, _ = native.ring_census(adj, 8)
        assert rings == [] and undiscovered > 0
        rings, undiscovered, _ = native.ring_census(adj, 10)
        assert len(rings) == 1 and undiscovered == 0

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_networkx_oracle(self, seed):
        rng = np.random.default_rng(seed)
        n = 14
        edges = set()
        while len(edges) < 20:
            u, v = rng.integers(0, n, 2)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        adj = adjacency_from_edges(n, sorted(edges))
        rings, _, _ = native.ring_census(adj, 14, max_paths=256)
        got = {tuple(r) for r in rings}
        expected = nx_primitive_rings(adj, 14)
        assert got == expected

    def test_python_fallback_matches_native(self):
        adj = adjacency_from_edges(
            8, [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (5, 6),
                (6, 7), (7, 4)]
        )
        native_rings, nu, nk = native.ring_census(adj, 10)
        py_rings, pu, pk = native._ring_census_py(adj, 10)
        assert sorted(map(tuple, native_rings)) == sorted(map(tuple, py_rings))
        assert (nu, nk) == (pu, pk)


class TestDeviceBfs:
    def test_matches_host_bfs(self):
        rng = np.random.default_rng(3)
        n = 20
        adj_mat = np.zeros((n, n), bool)
        for _ in range(30):
            u, v = rng.integers(0, n, 2)
            if u != v:
                adj_mat[u, v] = adj_mat[v, u] = True
        import jax.numpy as jnp

        dist_dev = np.asarray(graph_kernel.bfs_distances(jnp.asarray(adj_mat), 16))
        adj = [list(np.nonzero(adj_mat[i])[0]) for i in range(n)]
        for s in range(n):
            host = native._bfs(adj, s)
            host = np.where(host > 16, graph_kernel.UNREACHED, host)
            assert np.array_equal(dist_dev[s], host), s


class TestRingClass:
    def hexagonal_frame(self):
        """Periodic honeycomb (2x2 of the 4-atom rectangular graphene
        cell, 16 C atoms): all true rings are hexagons; short winding
        cycles around the cell exist in the quotient graph and must be
        rejected by the shift bookkeeping."""
        a = 1.42  # C-C
        base = np.array([
            [0, 0, 0],
            [a / 2, np.sqrt(3) * a / 2, 0],
            [3 * a / 2, np.sqrt(3) * a / 2, 0],
            [2 * a, 0, 0],
        ])
        reps = np.array(
            [[i, j, 0] for i in range(2) for j in range(2)], np.float64
        )
        unit = np.array([3 * a, np.sqrt(3) * a, 10.0])
        pts = (base[None, :, :] + (reps * unit)[:, None, :]).reshape(-1, 3)
        cell = np.diag([6 * a, 2 * np.sqrt(3) * a, 10.0])
        return Frame(pts, [6] * len(pts), cell)

    def test_from_trajectory_graphene(self):
        f = self.hexagonal_frame()
        ring = amring.Ring.from_trajectory(
            [f, f], {"C-C": 1.6}, max_search_depth=16, delta_Step=10
        )
        arr = ring.data["ring"]
        assert "Step" in arr.dims and "ring_size" in arr.dims
        assert np.array_equal(arr.get_coord("Step"), [0, 10])
        rc6 = arr.sel(ring_size=6, ring_var="RC")
        assert np.all(rc6.values > 0)
        # every node is in a 6-ring
        pn6 = arr.sel(ring_size=6, ring_var="PN")
        assert np.allclose(pn6.values, 1.0)
        rs = ring.report_search
        assert not rs["Discarded frame"].any()
        assert (rs["Potentially undiscovered rings"] == 0).all()

    def test_adaptive_depth(self):
        """An 18-ring needs the depth loop to go past 16."""
        n = 18
        pts = [
            [8 + 5 * np.cos(2 * np.pi * i / n), 8 + 5 * np.sin(2 * np.pi * i / n), 8]
            for i in range(n)
        ]
        f = Frame(pts, [6] * n, np.eye(3) * 16.0)
        ring = amring.Ring.from_trajectory(
            [f], {"C-C": 2.0}, max_search_depth=32
        )
        rs = ring.report_search
        assert rs["Final search_depth"].iloc[0] >= 18
        arr = ring.data["ring"]
        assert arr.sel(ring_size=18, ring_var="RC").values.item() == 1

    def test_discard_policy(self):
        n = 18
        pts = [
            [8 + 5 * np.cos(2 * np.pi * i / n), 8 + 5 * np.sin(2 * np.pi * i / n), 8]
            for i in range(n)
        ]
        f = Frame(pts, [6] * n, np.eye(3) * 16.0)
        ring = amring.Ring(
            max_search_depth=12,
            discard_if_potentially_undiscovered_rings=True,
        )
        ring.compute_ring([f], [{"C-C": 2.0}], np.array([0]))
        assert ring.report_search["Discarded frame"].iloc[0]
        assert "ring" not in ring.data

    def test_file_roundtrip(self, tmp_path):
        f = self.hexagonal_frame()
        ring = amring.Ring.from_trajectory([f], {"C-C": 1.6})
        ring.write_to_file(tmp_path / "t")
        back = amring.Ring.from_file(tmp_path / "t")
        assert back.data["ring"].allclose(ring.data["ring"])
        rs = (tmp_path / "t.report_search.csv")
        assert rs.exists()


class TestScale:
    def test_diamond_network_census(self):
        """4-coordinated diamond net (the topology of a Zn-Im network):
        exactly 2 hexagons per node, nothing else at depth 8."""
        a = 5.0
        base = np.array([
            [0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0],
            [.25, .25, .25], [.25, .75, .75], [.75, .25, .75],
            [.75, .75, .25],
        ])
        reps = 3
        cells = np.array(
            [[i, j, k] for i in range(reps) for j in range(reps)
             for k in range(reps)]
        )
        frac_all = ((base[None] + cells[:, None]) / reps).reshape(-1, 3)
        n = len(frac_all)
        f = Frame(frac_all * a * reps, [6] * n, np.eye(3) * a * reps)
        nn = a * np.sqrt(3) / 4
        ring = amring.Ring.from_trajectory(
            [f], {"C-C": nn * 1.1}, max_search_depth=8
        )
        arr = ring.data["ring"]
        assert np.array_equal(arr.get_coord("ring_size"), [6])
        assert arr.sel(ring_var="RC").values.ravel()[0] == 2 * n
        pn = arr.sel(ring_var="PN", ring_size=6).values.item()
        assert pn == 1.0


class TestRingVarParity:
    """ring_var labels: canonical Le Roux & Jund names, with alias
    normalization for the literal RINGS-res-5.dat header spellings the
    reference stores verbatim (VERDICT r1 next #4)."""

    def test_normalize_aliases(self):
        from amof_tpu.ring.core import RING_VARS, normalize_ring_var

        for alias, want in [
            ("Rc(n)", "RC"), ("RC", "RC"), (" rc ", "RC"), ("Rn(n)", "RC"),
            ("P_N(n)", "PN"), ("PN", "PN"), ("pn(n)", "PN"),
            ("P_max(n)", "Pmax"), ("Pmax", "Pmax"), ("PMAX", "Pmax"),
            ("P_min(n)", "Pmin"), ("pmin", "Pmin"),
        ]:
            assert normalize_ring_var(alias) == want, alias
        assert normalize_ring_var("unknown") == "unknown"
        assert RING_VARS == ["RC", "PN", "Pmax", "Pmin"]

    def test_reference_style_file_normalized_on_read(self, tmp_path):
        """A .ring file whose ring_var carries literal RINGS header
        names must come back selectable by the canonical names."""
        import amof_tpu.ring as amring
        from amof_tpu import labeled

        da = labeled.DataArray(
            np.arange(8, dtype=np.float64).reshape(2, 4),
            coords={
                "ring_size": np.array([3, 5]),
                "ring_var": np.array(
                    ["Rc(n)", "P_N(n)", "P_max(n)", "P_min(n)"]
                ),
            },
            dims=("ring_size", "ring_var"),
            name="ring",
        )
        labeled.Dataset({"ring": da}).to_netcdf(tmp_path / "ref.ring")
        ring = amring.Ring.from_file(tmp_path / "ref")
        back = ring.data["ring"]
        assert list(back.get_coord("ring_var")) == ["RC", "PN", "Pmax",
                                                    "Pmin"]
        np.testing.assert_array_equal(
            back.sel(ring_var="PN").values, [1.0, 5.0]
        )
