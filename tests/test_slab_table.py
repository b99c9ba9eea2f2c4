"""2-level (x-slab, y-window) neighbor table: exactness vs the full
O(N^2) table (interpret-mode Mosaic kernel on CPU)."""

import numpy as np
import pytest

from amof_tpu.ops import pair_engine, slab_table
from amof_tpu.ops.slab_table import build_slab_layout, slab_plan


def _case(n, box, n_species, seed, pad_from=None, triclinic=False):
    rng = np.random.default_rng(seed)
    if triclinic:
        from amof_tpu.core import cellmath

        cell = cellmath.cellpar_to_cell(
            [box, box * 1.07, box * 0.93, 82, 94, 100]
        ).astype(np.float32)
    else:
        cell = (np.eye(3) * box).astype(np.float32)
    pos = (rng.uniform(0, 1, (n, 3)) @ cell).astype(np.float32)
    sp = rng.integers(0, n_species, n).astype(np.int32)
    if pad_from is not None:
        sp[pad_from:] = -1
        pos[pad_from:] = 0.0
    return pos, cell, sp


def _oracle_sets(pos, cell, sp, cutoff_matrix, s):
    """Neighbor index sets per real atom via the full table."""
    k = 64
    nbr_idx, cnt, ovf = pair_engine.frame_neighbor_table(
        pos, cell, sp, cutoff_matrix, max_neighbors=k, chunk=64
    )
    assert not bool(ovf)
    nbr_idx = np.asarray(nbr_idx)
    cnt = np.asarray(cnt)
    out = {}
    for i in range(len(sp)):
        if sp[i] >= 0:
            out[i] = set(nbr_idx[i, :cnt[i]].tolist())
    return out


def _slab_sets(pos, cell, sp, cutoff_matrix, plan, k=16):
    """Neighbor sets per real atom via the 2-level table (interpret)."""
    import jax.numpy as jnp

    centers, cand, starts, qb, missed = build_slab_layout(
        jnp.asarray(pos), jnp.asarray(sp), jnp.asarray(cell), plan
    )
    assert not bool(missed)
    from amof_tpu.ops.pallas_neighbors import pallas_window_table_slab

    nbr_pos, nbr_sp, cnt = pallas_window_table_slab(
        centers, cand, starts, qb, jnp.asarray(cell),
        jnp.asarray(cutoff_matrix), cutoff_matrix.shape[0], k,
        plan.chunk, plan.window, interpret=True,
    )
    gidx = np.asarray(centers[:, 4]).astype(np.int64)
    sp_c = np.asarray(centers[:, 3]).astype(np.int32)
    nbr_pos = np.asarray(nbr_pos)
    nbr_sp = np.asarray(nbr_sp)
    cnt = np.asarray(cnt)
    # map neighbor positions back to atom indices (positions unique
    # with overwhelming probability for random cases)
    key = {tuple(np.round(pos[i], 5)): i for i in range(len(sp))}
    out = {}
    for r in range(len(gidx)):
        if sp_c[r] < 0:
            continue
        i = int(gidx[r])
        assert cnt[r] <= k
        members = set()
        for slot in range(cnt[r]):
            members.add(key[tuple(np.round(nbr_pos[r, slot], 5))])
        assert (nbr_sp[r, :cnt[r]] >= 0).all()
        assert (nbr_sp[r, cnt[r]:] == -1).all()
        out[i] = members
    return out


class TestSlabPlan:
    def test_small_cell_returns_none(self):
        cell = np.eye(3) * 5.0
        assert slab_plan(cell, 2.0, 100) is None

    def test_bench_like_plan(self):
        cell = np.eye(3) * 54.87
        plan = slab_plan(cell, 2.0, 10752)
        assert plan is not None
        assert plan.nsx == 27
        assert plan.window % 128 == 0
        assert plan.m_centers % plan.chunk == 0
        assert plan.m_cand % 128 == 0
        assert plan.m_centers <= 1.6 * 10752

    def test_data_aware_capacity(self):
        """With ``positions`` the per-slab capacity is sized from the
        actual max slab population, covering x-structured densities
        the uniform estimate under-caps."""
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        n, box = 4096, 40.0
        cell = (np.eye(3) * box).astype(np.float32)
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
        # pile 25% of atoms into a 4-slab x-band (interface-like);
        # denser sheets inflate the filler count past pad_limit and
        # slab_plan correctly returns None instead
        k = int(0.25 * n)
        pos[:k, 0] = rng.uniform(0.0, 8.0, k)
        sp = rng.integers(0, 2, n).astype(np.int32)
        uni = slab_plan(cell, 2.0, n, pad_limit=4.0)
        aware = slab_plan(cell, 2.0, n, pad_limit=4.0,
                          positions=pos, species_idx=sp)
        assert aware is not None
        assert aware.cap > uni.cap
        *_, missed = build_slab_layout(
            jnp.asarray(pos), jnp.asarray(sp), jnp.asarray(cell), aware
        )
        assert not bool(missed)

    def test_npt_uses_min_widths(self):
        cells = np.stack([np.eye(3) * 50.0, np.eye(3) * 40.0])
        plan = slab_plan(cells, 2.0, 8000)
        assert plan is not None
        assert plan.nsx == int(40.0 / 2.0)


class TestSlabLayout:
    def test_every_real_atom_is_a_center_once(self):
        import jax.numpy as jnp

        pos, cell, sp = _case(700, 24.0, 3, seed=1, pad_from=650)
        plan = slab_plan(cell, 2.2, 700, pad_limit=2.5)
        assert plan is not None
        centers, cand, starts, qb, missed = build_slab_layout(
            jnp.asarray(pos), jnp.asarray(sp), jnp.asarray(cell), plan
        )
        assert not bool(missed)
        sp_c = np.asarray(centers[:, 3]).astype(np.int32)
        gidx = np.asarray(centers[:, 4]).astype(np.int64)
        real_rows = gidx[sp_c >= 0]
        expected = np.nonzero(sp >= 0)[0]
        assert sorted(real_rows.tolist()) == expected.tolist()
        # slab alignment: every chunk's real rows share one slab
        inv = np.linalg.inv(np.asarray(cell, np.float64))
        for c0 in range(0, plan.m_centers, plan.chunk):
            rows = slice(c0, c0 + plan.chunk)
            xyz = np.asarray(centers[rows, 0:3], np.float64)
            live = sp_c[rows] >= 0
            if not live.any():
                continue
            fx = (xyz[live] @ inv)[:, 0] % 1.0
            slabs = np.minimum(
                (fx * plan.nsx).astype(int), plan.nsx - 1
            )
            assert len(set(slabs.tolist())) == 1

    def test_pad_runs_do_not_clump_slabs(self):
        """Species-block layouts carry contiguous pad RUNS between
        blocks; keying their synthetic fx off the global row index
        piled whole runs into one or two slabs (measured 624 atoms in
        a 528-cap slab at bench shapes). Rank-spread keeps every slab
        at exactly ``cap`` rows with fillers diluted uniformly."""
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        n, box = 1024, 26.0
        cell = (np.eye(3) * box).astype(np.float32)
        pos = (rng.uniform(0, box, (n, 3))).astype(np.float32)
        sp = rng.integers(0, 3, n).astype(np.int32)
        for run in (slice(200, 330), slice(600, 730)):
            sp[run] = -1
            pos[run] = 0.0
        plan = slab_plan(cell, 2.0, n, pad_limit=2.5)
        assert plan is not None
        centers, cand, starts, qb, missed = build_slab_layout(
            jnp.asarray(pos), jnp.asarray(sp), jnp.asarray(cell), plan
        )
        assert not bool(missed)
        # filler slots spread across slabs instead of clumping: no
        # slab carries more than a proportional share of fillers
        sp_c = np.asarray(centers[:, 3]).astype(np.int32)
        fill_per_slab = (
            (sp_c < 0).reshape(plan.nsx, plan.cap).sum(axis=1)
        )
        n_fill = plan.m_centers - (sp >= 0).sum()
        assert fill_per_slab.max() <= 2.5 * n_fill / plan.nsx + 8

    def test_capacity_miss_flagged(self):
        import jax.numpy as jnp

        # all atoms piled into one slab: per-slab capacity must trip
        pos, cell, sp = _case(700, 24.0, 2, seed=2)
        pos[:, 0] = 1.0  # one x-slab
        plan = slab_plan(cell, 2.2, 700, pad_limit=2.5)
        assert plan is not None
        *_, missed = build_slab_layout(
            jnp.asarray(pos), jnp.asarray(sp), jnp.asarray(cell), plan
        )
        assert bool(missed)


class TestSlabTableExactness:
    @pytest.mark.parametrize("seed,pad_from,triclinic", [
        (0, None, False),
        (1, 640, False),
        (2, None, True),
    ])
    def test_neighbor_sets_match_full_table(self, seed, pad_from,
                                            triclinic):
        n, box, s = 704, 23.0, 3
        pos, cell, sp = _case(n, box, s, seed, pad_from=pad_from,
                              triclinic=triclinic)
        rng = np.random.default_rng(seed + 100)
        cutoff_matrix = rng.uniform(1.2, 2.1, (s, s)).astype(np.float32)
        cutoff_matrix = ((cutoff_matrix + cutoff_matrix.T) / 2).astype(
            np.float32
        )
        plan = slab_plan(cell, float(cutoff_matrix.max()), n, pad_limit=2.5)
        assert plan is not None
        ref = _oracle_sets(pos, cell, sp, cutoff_matrix, s)
        got = _slab_sets(pos, cell, sp, cutoff_matrix, plan)
        assert ref.keys() == got.keys()
        for i in ref:
            assert ref[i] == got[i], i

    def test_bad_histograms_match(self):
        """frame_bad_counts(slab=plan) == frame_bad_counts(window=None)
        bit-exactly, including the emitted CN matrix."""
        import jax.numpy as jnp

        from amof_tpu.ops import bad_kernel

        n, box, s = 704, 23.0, 2
        pos, cell, sp = _case(n, box, s, seed=5, pad_from=672)
        cutoff_matrix = np.array(
            [[1.8, 2.0], [2.0, 1.6]], np.float32
        )
        plan = slab_plan(cell, 2.0, n, pad_limit=2.5)
        assert plan is not None
        ref = bad_kernel.frame_bad_counts(
            pos, cell, sp, cutoff_matrix, s, 1.0, 181,
            max_neighbors=16, chunk=64, window=None,
        )
        got = bad_kernel.frame_bad_counts(
            pos, cell, sp, cutoff_matrix, s, 1.0, 181,
            max_neighbors=16, chunk=64, window=None, slab=plan,
            emit_cn=True,
        )
        assert not bool(ref[2]) and not bool(got[2])
        assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))
        # emitted CN equals the dedicated pair pass
        cn_ref = pair_engine.frame_cn_counts(
            pos, cell, sp, cutoff_matrix, s, chunk=64
        )
        assert np.allclose(np.asarray(got[3]), np.asarray(cn_ref))

    def test_overflow_flag(self):
        n, box, s = 704, 23.0, 2
        pos, cell, sp = _case(n, box, s, seed=7)
        cutoff_matrix = np.full((s, s), 2.2, np.float32)
        plan = slab_plan(cell, 2.2, n, pad_limit=2.5)
        assert plan is not None
        out = slab_table.frame_neighbor_payload_table_slab(
            pos, cell, sp, cutoff_matrix, 1, plan, interpret=True
        )
        assert bool(out[3])  # K=1 must overflow somewhere


class TestPipelineSlabWiring:
    def test_make_step_slab_matches_window(self):
        """The fused pipeline step with ``bad_slab=plan`` equals the
        1-level windowed step bit for bit (RDF/CN/BAD/overflow),
        validating the _make_step wiring the TPU path rides."""
        from amof_tpu.parallel import pipeline
        from amof_tpu.parallel.mesh import analysis_mesh

        rng = np.random.default_rng(21)
        nf, n, box, s = 2, 704, 23.0, 2
        pos, cell, sp = _case(n, box, s, seed=21, pad_from=672)
        pos = np.stack([pos, ((rng.uniform(0, 1, (n, 3)) @ cell)
                              .astype(np.float32))])
        pos[1, 672:] = 0.0
        cm = np.array([[1.8, 2.0], [2.0, 1.6]], np.float32)
        plan = slab_plan(cell, 2.0, n, pad_limit=2.5)
        assert plan is not None

        mesh = analysis_mesh(1)
        cells = np.tile(cell, (nf, 1, 1)).astype(np.float32)
        vols = np.full(nf, float(np.linalg.det(cell)), np.float32)
        masses = (sp >= 0).astype(np.float32)
        w = np.ones(nf, np.float32)
        args = (pos, cells, vols, sp, cm, masses, w)
        kw = dict(
            n_species=s, bins=64, dr=0.1, bad_bins=181, dtheta=1.0,
            max_neighbors=16, chunk=64, method="mxu",
            n_atoms_padded=n, with_bad=True, with_msd=False,
            origin_policy="amof", bad_window=256,
        )
        ref = pipeline._make_step(mesh, **kw)(*args)
        got = pipeline._make_step(mesh, bad_slab=plan, **kw)(*args)
        assert not np.asarray(ref["bad_overflow"]).any()
        assert not np.asarray(got["bad_overflow"]).any()
        for key in ("rdf_counts", "cn_counts", "bad_concrete",
                    "bad_center_any"):
            assert np.array_equal(
                np.asarray(ref[key]), np.asarray(got[key])
            ), key
