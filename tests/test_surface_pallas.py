"""Parity tests: Pallas surface engine vs the XLA column pass.

The Pallas kernel (amof_tpu/pore/surface_kernel.py) must reproduce
``surface_valid_columns`` exactly: same per-point validity and voxel
indices for every atom the XLA path computes, and identical
``classify_surface_points`` outputs when the exact candidate prefilter
is active (slot partitioning differs — 128-atom chunks vs 64 — so only
per-atom/classification comparisons are meaningful). Runs in Pallas
interpret mode on the CPU suite; the hardware path is exercised by
scripts/probe_surface_pallas.py and the bench.

Behavior parity: Zeo++ ASA sampling, amof/pore/pysimmzeopp.py:119-128.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from amof_tpu.pore import grid_kernel  # noqa: E402
from amof_tpu.pore.surface_kernel import (  # noqa: E402
    surface_valid_columns_pallas,
)


def _per_atom(valid, gis, idx_pt, idx_nudge, n, k):
    """Map slot-ordered outputs back to per-atom arrays."""
    valid, gis = np.asarray(valid), np.asarray(gis)
    i1, i2 = np.asarray(idx_pt), np.asarray(idx_nudge)
    live = gis >= 0
    assert np.bincount(gis[live], minlength=n).max() <= 1
    v = np.zeros((n, k), bool)
    a1 = np.zeros((n, k), np.int64)
    a2 = np.zeros((n, k), np.int64)
    v[gis[live]] = valid[live]
    a1[gis[live]] = i1[live]
    a2[gis[live]] = i2[live]
    return v, a1, a2, live.sum()


def _system(seed, n=700, box=18.0):
    rng = np.random.default_rng(seed)
    frac = rng.random((n, 3)).astype(np.float32)
    frac[:, 2] *= 0.72  # void slab: nonzero surface
    cell = np.eye(3, dtype=np.float32) * box
    radii = rng.uniform(1.2, 1.9, n).astype(np.float32)
    return frac, cell, radii


class TestSurfacePallasParity:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_all_candidates_match_xla(self, seed):
        n = 700
        frac, cell, radii = _system(seed, n)
        dirs = jnp.asarray(grid_kernel.fibonacci_sphere(8))
        grid = (16, 16, 16)
        kw = dict(nbx=3, nby=3, window=448, col_cap=128)

        vx, i1x, i2x, gx, rx, mx = grid_kernel.surface_valid_columns(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            1.2, dirs, grid, chunk=32, **kw,
        )
        vp, i1p, i2p, gp, rp, mp = surface_valid_columns_pallas(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            1.2, dirs, grid, interpret=True, **kw,
        )
        assert bool(np.asarray(mx)) == bool(np.asarray(mp)) is False
        ax = _per_atom(vx, gx, i1x, i2x, n, 8)
        ap = _per_atom(vp, gp, i1p, i2p, n, 8)
        assert ax[3] == ap[3] == n  # every atom in exactly one slot
        np.testing.assert_array_equal(ax[0], ap[0])
        np.testing.assert_array_equal(ax[1], ap[1])
        np.testing.assert_array_equal(ax[2], ap[2])

    def test_prefilter_classification_match(self):
        n = 700
        frac, cell, radii = _system(11, n)
        dirs = jnp.asarray(grid_kernel.fibonacci_sphere(8))
        grid = (16, 16, 16)
        kw = dict(nbx=3, nby=3, window=448, col_cap=128)

        # synthetic disjoint accessible/pocket fields mirroring the
        # production m_chan = accessible | pocket candidate mask
        rng = np.random.default_rng(5)
        acc = rng.random(grid) < 0.10
        poc = (~acc) & (rng.random(grid) < 0.05)
        cand_mask = jnp.asarray(acc | poc)
        acc_j, poc_j = jnp.asarray(acc), jnp.asarray(poc)

        outs = {}
        for name, fn, extra in (
            ("xla", grid_kernel.surface_valid_columns,
             {"chunk": 32}),
            ("pallas", surface_valid_columns_pallas,
             {"interpret": True}),
        ):
            v, i1, i2, g, r, m = fn(
                jnp.asarray(frac), jnp.asarray(cell),
                jnp.asarray(radii), 1.2, dirs, grid,
                cand_mask=cand_mask, **kw, **extra,
            )
            assert not bool(np.asarray(m))
            a, na = grid_kernel.classify_surface_points(
                v, i1, i2, acc_j, poc_j
            )
            areas = np.where(
                np.asarray(g) >= 0,
                4.0 * np.pi * (np.asarray(r) + 1.2) ** 2, 0.0,
            )
            outs[name] = (
                float(np.sum(areas * np.asarray(a))),
                float(np.sum(areas * np.asarray(na))),
                int(np.asarray(a).sum()), int(np.asarray(na).sum()),
            )
        assert outs["xla"] == outs["pallas"]
        assert outs["xla"][2] > 0  # non-degenerate

    def test_candidate_valid_rows_match_under_prefilter(self):
        n = 700
        frac, cell, radii = _system(2, n)
        dirs = jnp.asarray(grid_kernel.fibonacci_sphere(8))
        grid = (16, 16, 16)
        kw = dict(nbx=3, nby=3, window=448, col_cap=128)
        rng = np.random.default_rng(9)
        cand_mask = jnp.asarray(rng.random(grid) < 0.12)

        inv_cell = jnp.linalg.inv(jnp.asarray(cell))
        cand = np.asarray(grid_kernel.surface_candidate_mask(
            jnp.asarray(frac), inv_cell, jnp.asarray(radii), 1.2,
            dirs, grid, cand_mask,
        ))
        assert 0 < cand.sum() < n  # mixed population

        vx, i1x, i2x, gx, rx, mx = grid_kernel.surface_valid_columns(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            1.2, dirs, grid, chunk=32, cand_mask=cand_mask, **kw,
        )
        vp, i1p, i2p, gp, rp, mp = surface_valid_columns_pallas(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            1.2, dirs, grid, cand_mask=cand_mask, interpret=True, **kw,
        )
        ax = _per_atom(vx, gx, i1x, i2x, n, 8)
        ap = _per_atom(vp, gp, i1p, i2p, n, 8)
        # candidate atoms: full validity parity (non-candidates depend
        # on which chunk they share with a candidate — classification
        # ignores them, test above)
        np.testing.assert_array_equal(ax[0][cand], ap[0][cand])

    def test_missed_flag_on_overflow(self):
        n = 700
        frac, cell, radii = _system(4, n)
        dirs = jnp.asarray(grid_kernel.fibonacci_sphere(8))
        grid = (16, 16, 16)
        _, _, _, _, _, m = surface_valid_columns_pallas(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            1.2, dirs, grid, nbx=3, nby=3, window=64, col_cap=128,
            interpret=True,
        )
        assert bool(np.asarray(m))


class TestBatchedPoreEngineParity:
    def test_engines_agree_end_to_end(self):
        """BatchedPore with surface_engine='pallas' (interpret) must
        reproduce the XLA engine's records exactly."""
        from amof_tpu.core.frames import FrameBatch
        from amof_tpu.parallel.mesh import analysis_mesh
        from amof_tpu.pore.batch import BatchedPore

        rng = np.random.default_rng(23)
        nf, n, box = 2, 700, 21.0
        pos = rng.uniform(0, box, (nf, n, 3)).astype(np.float32)
        pos[:, :, 2] *= 0.72  # void slab
        batch = FrameBatch(
            pos, np.tile(np.eye(3, dtype=np.float32) * box, (nf, 1, 1)),
            np.full(n, 6, np.int32), np.arange(nf, dtype=np.int32),
        )
        recs = {}
        for eng in ("xla", "pallas"):
            bp = BatchedPore(resolution=0.4, vol_method="mc",
                             num_samples=20000, surface_engine=eng)
            r, _ = bp.run(batch, mesh=analysis_mesh(1))
            recs[eng] = r
        for a, b in zip(recs["xla"], recs["pallas"]):
            for key in ("AV_A^3", "NAV_A^3", "ASA_A^2", "NASA_A^2"):
                # per-point/voxel parity is exact; the record sums run
                # in different slot orders (128- vs 64-atom chunks), so
                # allow f32 reassociation ulps
                assert a[key] == pytest.approx(b[key], rel=1e-5), key
            assert a["ASA_A^2"] > 0


class TestVoidMasksPallas:
    @pytest.mark.parametrize("seed,two", [(0, False), (5, True)])
    def test_masks_and_fit_match_xla(self, seed, two):
        """void_masks_points_pallas must reproduce void_masks_columns
        exactly: masks elementwise, point fits on weighted points,
        missed flags."""
        from amof_tpu.pore.surface_kernel import void_masks_points_pallas

        rng = np.random.default_rng(seed)
        n, box = 300, 17.0
        frac = rng.random((n, 3)).astype(np.float32)
        frac[:, 2] *= 0.7
        cell = np.eye(3, dtype=np.float32) * box
        radii = rng.uniform(1.1, 1.8, n).astype(np.float32)
        nbx = nby = 4
        window = 256
        grid = (16, 16, 16)
        probe, chan = (1.0, 1.2) if two else (1.2, 1.2)
        pts = rng.random((3000, 3)).astype(np.float32)
        pts_tiled, w = grid_kernel.assign_points_to_xytiles(
            pts, {"nbx": nbx, "nby": nby}
        )

        mp_x, mc_x, fit_x, miss_x = grid_kernel.void_masks_columns(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            grid, probe=probe, chan=chan, nbx=nbx, nby=nby,
            window=window, pts_tiled=jnp.asarray(pts_tiled),
        )
        mp_p, mc_p, fit_p, miss_p = void_masks_points_pallas(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            grid, probe=probe, chan=chan, nbx=nbx, nby=nby,
            window=window, pts_tiled=jnp.asarray(pts_tiled),
            interpret=True,
        )
        assert bool(np.asarray(miss_x)) == bool(np.asarray(miss_p))
        np.testing.assert_array_equal(np.asarray(mp_x), np.asarray(mp_p))
        np.testing.assert_array_equal(np.asarray(mc_x), np.asarray(mc_p))
        real = np.asarray(w) > 0
        np.testing.assert_array_equal(
            np.asarray(fit_x)[real], np.asarray(fit_p)[real]
        )
        m = np.asarray(mc_x)
        assert 0 < m.sum() < m.size

    def test_masks_triclinic_no_points(self):
        from amof_tpu.pore.surface_kernel import void_masks_points_pallas

        rng = np.random.default_rng(3)
        n = 260
        cell = np.array(
            [[16.0, 0, 0], [1.4, 15.4, 0], [-0.9, 1.1, 15.8]],
            np.float32,
        )
        frac = rng.random((n, 3)).astype(np.float32)
        frac[:, 2] *= 0.7
        radii = rng.uniform(1.1, 1.8, n).astype(np.float32)
        nbx = nby = 4
        grid = (16, 16, 16)
        mp_x, mc_x, _, miss_x = grid_kernel.void_masks_columns(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            grid, probe=1.2, chan=1.2, nbx=nbx, nby=nby, window=256,
        )
        mp_p, mc_p, fit_p, miss_p = void_masks_points_pallas(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            grid, probe=1.2, chan=1.2, nbx=nbx, nby=nby, window=256,
            interpret=True,
        )
        assert fit_p is None
        assert bool(np.asarray(miss_x)) == bool(np.asarray(miss_p))
        np.testing.assert_array_equal(np.asarray(mp_x), np.asarray(mp_p))
        np.testing.assert_array_equal(np.asarray(mc_x), np.asarray(mc_p))

    def test_engines_agree_triclinic_npt(self):
        """Per-frame varying triclinic cells through both engines."""
        from amof_tpu.core.frames import FrameBatch
        from amof_tpu.parallel.mesh import analysis_mesh
        from amof_tpu.pore.batch import BatchedPore

        rng = np.random.default_rng(31)
        nf, n = 2, 600
        base = np.array(
            [[21.0, 0, 0], [1.8, 20.3, 0], [-1.2, 1.5, 20.7]],
            np.float32,
        )
        cells = np.stack([base * (1.0 + 0.02 * f) for f in range(nf)])
        frac = rng.random((nf, n, 3)).astype(np.float32)
        frac[:, :, 2] *= 0.72
        pos = np.einsum("fni,fij->fnj", frac, cells).astype(np.float32)
        batch = FrameBatch(
            pos, cells, np.full(n, 6, np.int32),
            np.arange(nf, dtype=np.int32),
        )
        recs = {}
        for eng in ("xla", "pallas"):
            bp = BatchedPore(resolution=0.4, vol_method="mc",
                             num_samples=20000, surface_engine=eng)
            r, _ = bp.run(batch, mesh=analysis_mesh(1))
            recs[eng] = r
        for a, b in zip(recs["xla"], recs["pallas"]):
            for key in ("AV_A^3", "NAV_A^3", "ASA_A^2", "NASA_A^2"):
                assert a[key] == pytest.approx(b[key], rel=1e-5), key
        assert sum(a["ASA_A^2"] + a["NASA_A^2"] for a in recs["xla"]) > 0


class TestDeadPadRows:
    def test_small_system_window_overruns_dead_tail(self):
        """N=40 with window=64: every window overruns the real rows
        into the dead pad tail. Dead rows must be inert — without the
        radius<0 threshold guard they acted as phantom blockers (the
        xy unwrap collapses their 1e6 coordinates into the cell and
        the squared threshold is large positive), silently corrupting
        masks/fits/validity with missed=False."""
        from amof_tpu.pore.surface_kernel import (
            surface_valid_columns_pallas,
            void_masks_points_pallas,
        )

        rng = np.random.default_rng(1)
        n, box = 40, 20.0
        frac = rng.random((n, 3)).astype(np.float32)
        cell = np.eye(3, dtype=np.float32) * box
        radii = rng.uniform(1.2, 1.8, n).astype(np.float32)
        grid = (16, 16, 16)
        pts = rng.random((800, 3)).astype(np.float32)
        pts_tiled, w = grid_kernel.assign_points_to_xytiles(
            pts, {"nbx": 4, "nby": 4}
        )

        mp_x, mc_x, fit_x, miss_x = grid_kernel.void_masks_columns(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            grid, probe=1.2, chan=1.2, nbx=4, nby=4, window=64,
            pts_tiled=jnp.asarray(pts_tiled),
        )
        mp_p, mc_p, fit_p, miss_p = void_masks_points_pallas(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            grid, probe=1.2, chan=1.2, nbx=4, nby=4, window=64,
            pts_tiled=jnp.asarray(pts_tiled), interpret=True,
        )
        assert bool(np.asarray(miss_x)) == bool(np.asarray(miss_p))
        np.testing.assert_array_equal(np.asarray(mc_x), np.asarray(mc_p))
        np.testing.assert_array_equal(np.asarray(mp_x), np.asarray(mp_p))
        real = np.asarray(w) > 0
        np.testing.assert_array_equal(
            np.asarray(fit_x)[real], np.asarray(fit_p)[real]
        )
        assert np.asarray(mc_x).sum() > 0

        dirs = jnp.asarray(grid_kernel.fibonacci_sphere(8))
        vx, i1x, i2x, gx_, rx, mx = grid_kernel.surface_valid_columns(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            1.2, dirs, grid, nbx=3, nby=3, window=24, chunk=32,
            col_cap=32,
        )
        vp, i1p, i2p, gp, rp, mp = surface_valid_columns_pallas(
            jnp.asarray(frac), jnp.asarray(cell), jnp.asarray(radii),
            1.2, dirs, grid, nbx=3, nby=3, window=24, col_cap=32,
            interpret=True,
        )
        assert bool(np.asarray(mx)) == bool(np.asarray(mp))
        ax = _per_atom(vx, gx_, i1x, i2x, n, 8)
        ap = _per_atom(vp, gp, i1p, i2p, n, 8)
        np.testing.assert_array_equal(ax[0], ap[0])
        assert ax[0].sum() > 0  # sparse system: surface points exist
