"""Pallas RDF kernel: bit-exact equivalence with the XLA pair engine
(interpret mode on CPU; the same check runs compiled on TPU in bench)."""

import numpy as np
import pytest

from amof_tpu.ops import pair_engine
from amof_tpu.ops.pallas_rdf import pallas_rdf_counts


def _case(n, box, n_species, seed, pad_from=None):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    cell = (np.eye(3) * box).astype(np.float32)
    sp = rng.integers(0, n_species, n).astype(np.int32)
    if pad_from is not None:
        sp[pad_from:] = -1
    return pos, cell, sp


class TestPallasRdf:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_xla_engine(self, seed):
        pos, cell, sp = _case(512, 12.0, 3, seed, pad_from=500)
        ref = np.asarray(pair_engine.frame_rdf_counts(
            pos, cell, sp, 0.05, 3, 120, chunk=256, method="scatter"
        ))
        got = np.asarray(pallas_rdf_counts(
            pos, cell, sp, 0.05, 3, 120, ti=256, tj=256, interpret=True
        ))
        assert np.array_equal(ref, got)

    def test_triclinic_cell(self):
        from amof_tpu.core import cellmath

        rng = np.random.default_rng(3)
        cell = cellmath.cellpar_to_cell([11, 12, 13, 80, 95, 101]).astype(
            np.float32
        )
        pos = (rng.uniform(0, 1, (256, 3)) @ cell).astype(np.float32)
        sp = rng.integers(0, 2, 256).astype(np.int32)
        ref = np.asarray(pair_engine.frame_rdf_counts(
            pos, cell, sp, 0.1, 2, 50, chunk=256, method="scatter"
        ))
        got = np.asarray(pallas_rdf_counts(
            pos, cell, sp, 0.1, 2, 50, ti=128, tj=128, interpret=True
        ))
        assert np.array_equal(ref, got)

    def test_method_dispatch_through_engine(self):
        pos, cell, sp = _case(256, 10.0, 2, 5)
        # the engine routes method='pallas' only for static full ranges
        with pytest.raises(ValueError, match="pallas"):
            import jax.numpy as jnp

            pair_engine.frame_rdf_counts(
                pos, cell, sp, 0.1, 2, 50, method="pallas",
                i_start=jnp.int32(0), n_i=256,
            )


class TestPallasRdfBlocked:
    def test_layout_and_blocked_match_unblocked(self):
        from amof_tpu.ops.pallas_rdf import (
            apply_atom_layout,
            pallas_rdf_counts_blocked,
            species_block_layout,
        )

        rng = np.random.default_rng(9)
        n, box, s = 512, 12.0, 3
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
        cell = (np.eye(3) * box).astype(np.float32)
        sp = rng.integers(0, s, n).astype(np.int32)
        sp[500:] = -1  # pre-existing pads must be re-created by layout
        ref = np.asarray(pair_engine.frame_rdf_counts(
            pos, cell, sp, 0.05, s, 120, chunk=256, method="scatter"
        ))
        perm, sp_l = species_block_layout(sp, block=128, total_multiple=128)
        pos_l = apply_atom_layout(pos, perm)
        got = np.asarray(pallas_rdf_counts_blocked(
            pos_l, cell, sp_l, 0.05, s, 120, ti=128, tj=128, g=16,
            interpret=True,
        ))
        assert np.array_equal(ref, got)

    @pytest.mark.parametrize("p", [1, 2, 4])
    def test_packing_factors_bit_exact(self, p):
        """Quadrant packing (p streams per contraction column) is
        bit-exact for every p: streams land in disjoint (band,
        lane-quadrant) blocks and cross terms are discarded."""
        from amof_tpu.ops.pallas_rdf import (
            apply_atom_layout,
            pallas_rdf_counts_blocked,
            species_block_layout,
        )

        rng = np.random.default_rng(21)
        n, box, s = 384, 10.0, 2
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
        cell = (np.eye(3) * box).astype(np.float32)
        sp = rng.integers(0, s, n).astype(np.int32)
        ref = np.asarray(pair_engine.frame_rdf_counts(
            pos, cell, sp, 0.05, s, 120, chunk=128, method="scatter"
        ))
        perm, sp_l = species_block_layout(sp, block=128, total_multiple=128)
        pos_l = apply_atom_layout(pos, perm)
        got = np.asarray(pallas_rdf_counts_blocked(
            pos_l, cell, sp_l, 0.05, s, 120, ti=128, tj=128, g=16, p=p,
            interpret=True,
        ))
        assert np.array_equal(ref, got)

    def test_ortho_fast_path_bit_exact(self):
        """ortho=True (diagonal-cell cross-term skip) is bit-equal to
        the triclinic path on a diagonal cell — same per-axis ops with
        zero off-diagonals (v5e-verified in probe_rdf_variants)."""
        from amof_tpu.ops.pallas_rdf import (
            apply_atom_layout,
            pallas_rdf_counts_blocked,
            species_block_layout,
        )

        rng = np.random.default_rng(31)
        n, box, s = 384, 10.0, 2
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
        cell = (np.eye(3) * box).astype(np.float32)
        sp = rng.integers(0, s, n).astype(np.int32)
        perm, sp_l = species_block_layout(sp, block=128, total_multiple=128)
        pos_l = apply_atom_layout(pos, perm)
        kw = dict(ti=128, tj=128, g=16, interpret=True)
        tri = np.asarray(pallas_rdf_counts_blocked(
            pos_l, cell, sp_l, 0.05, s, 120, ortho=False, **kw
        ))
        ort = np.asarray(pallas_rdf_counts_blocked(
            pos_l, cell, sp_l, 0.05, s, 120, ortho=True, **kw
        ))
        assert np.array_equal(tri, ort)

    def test_pipeline_certifies_diagonal_cells(self):
        """FusedAnalysis.prepare flags ortho only when every frame's
        cell is exactly diagonal."""
        from amof_tpu.core.frames import FrameBatch
        from amof_tpu.parallel.mesh import analysis_mesh
        from amof_tpu.parallel import pipeline as pl_mod

        seen = []
        orig = pl_mod._make_step

        def spy(*a, **kw):
            seen.append(kw.get("ortho"))
            return orig(*a, **kw)

        rng = np.random.default_rng(5)
        pos = rng.uniform(0, 8.0, (2, 32, 3)).astype(np.float32)
        sp = np.full(32, 6, np.int32)
        step = np.arange(2, dtype=np.int32)
        diag = np.tile(np.eye(3, dtype=np.float32) * 8.0, (2, 1, 1))
        tric = diag.copy()
        tric[0, 0, 1] = 0.5
        pl_mod._make_step = spy
        try:
            fa = pl_mod.FusedAnalysis(
                {"C-C": 1.7}, dr=0.1, dtheta=2.0, chunk=16,
                method="scatter", with_bad=False, with_msd=False,
            )
            fa.prepare(FrameBatch(pos, diag, sp, step),
                       mesh=analysis_mesh(1))
            fa.prepare(FrameBatch(pos, tric, sp, step),
                       mesh=analysis_mesh(1))
        finally:
            pl_mod._make_step = orig
        assert seen == [True, False]

    def test_packing_production_bins_auto_bit_exact(self):
        """Auto packing at the production bin count (~1368: rmax =
        half_cell, dr = 0.02) resolves to p=4 (hardware-measured
        fastest; the VMEM budget admits it) and stays bit-exact."""
        from amof_tpu.ops.pallas_rdf import (
            apply_atom_layout,
            pallas_rdf_counts_blocked,
            resolve_packing,
            species_block_layout,
        )

        rng = np.random.default_rng(22)
        n, box, s, bins = 384, 30.0, 2, 1368
        assert resolve_packing(bins, 16, s, 128, 128) == 4
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
        cell = (np.eye(3) * box).astype(np.float32)
        sp = rng.integers(0, s, n).astype(np.int32)
        ref = np.asarray(pair_engine.frame_rdf_counts(
            pos, cell, sp, 0.01, s, bins, chunk=128, method="scatter"
        ))
        perm, sp_l = species_block_layout(sp, block=128, total_multiple=128)
        pos_l = apply_atom_layout(pos, perm)
        for p in ("auto", 2):
            got = np.asarray(pallas_rdf_counts_blocked(
                pos_l, cell, sp_l, 0.01, s, bins, ti=128, tj=128, g=16,
                p=p, interpret=True,
            ))
            assert np.array_equal(ref, got), p

    def test_resolve_packing_guards(self):
        """The packing selector respects g divisibility, the M-side
        row bound, and the VMEM budget (output block scales ~p^2)."""
        from amof_tpu.ops.pallas_rdf import resolve_packing

        # production bench shape: 4 species, ~1371 bins -> p=4 fits
        assert resolve_packing(1371, 64, 4, 256, 256) == 4
        # g not divisible by 4 -> p=2
        assert resolve_packing(1371, 2, 4, 256, 256) == 2
        # huge bin count: p=4's M side exceeds 512 rows -> p=2, then
        # VMEM forces p=1 as species count grows
        assert resolve_packing(9000, 64, 2, 256, 256) == 2
        assert resolve_packing(9000, 64, 13, 256, 256) == 1

    def test_layout_properties(self):
        from amof_tpu.ops.pallas_rdf import species_block_layout

        rng = np.random.default_rng(2)
        sp = rng.integers(0, 4, 300).astype(np.int32)
        perm, sp_l = species_block_layout(sp, block=64, total_multiple=256)
        assert len(sp_l) % 256 == 0
        # real atoms appear exactly once; species blocks are 64-aligned
        real = perm[perm >= 0]
        assert sorted(real.tolist()) == list(range(300))
        for i in range(0, len(sp_l), 64):
            blk = sp_l[i:i + 64]
            vals = set(blk.tolist()) - {-1}
            assert len(vals) <= 1

    def test_apply_atom_layout_3d(self):
        from amof_tpu.ops.pallas_rdf import (apply_atom_layout,
                                             species_block_layout)

        rng = np.random.default_rng(0)
        sp = rng.integers(0, 3, 100).astype(np.int32)
        pos = rng.uniform(0, 5, (4, 100, 3)).astype(np.float32)
        perm, sp_l = species_block_layout(sp, block=64, total_multiple=64)
        out = apply_atom_layout(pos, perm)
        assert out.shape == (4, len(sp_l), 3)
        real = perm >= 0
        assert np.array_equal(out[:, real], pos[:, perm[real]])
        assert (out[:, ~real] == 0).all()

    def test_blocked_triclinic(self):
        from amof_tpu.core import cellmath
        from amof_tpu.ops.pallas_rdf import (
            apply_atom_layout,
            pallas_rdf_counts_blocked,
            species_block_layout,
        )

        rng = np.random.default_rng(13)
        cell = cellmath.cellpar_to_cell([11, 12, 13, 80, 95, 101]).astype(
            np.float32
        )
        pos = (rng.uniform(0, 1, (256, 3)) @ cell).astype(np.float32)
        sp = rng.integers(0, 2, 256).astype(np.int32)
        ref = np.asarray(pair_engine.frame_rdf_counts(
            pos, cell, sp, 0.1, 2, 50, chunk=256, method="scatter"
        ))
        perm, sp_l = species_block_layout(sp, block=128, total_multiple=128)
        pos_l = apply_atom_layout(pos, perm)
        got = np.asarray(pallas_rdf_counts_blocked(
            pos_l, cell, sp_l, 0.1, 2, 50, ti=128, tj=128, g=16,
            interpret=True,
        ))
        assert np.array_equal(ref, got)
