"""Degenerate-input hardening: tiny trajectories, single atoms, empty
specs, missing species."""

import numpy as np
import pytest

import amof_tpu.bad as ambad
import amof_tpu.cn as amcn
import amof_tpu.msd as ammsd
import amof_tpu.rdf as amrdf
import amof_tpu.ring as amring
from amof_tpu.core.frames import Frame


def two_atom_frame():
    return Frame([[1, 1, 1], [3, 1, 1]], [30, 7], np.eye(3) * 8)


class TestEdgeCases:
    def test_single_frame_everything(self):
        f = two_atom_frame()
        rdf = amrdf.Rdf.from_trajectory([f], dr=0.2)
        assert len(rdf.data) == int(4.0 // 0.2)
        cn = amcn.CoordinationNumber.from_trajectory([f], {"Zn-N": 2.5})
        assert cn.data["Zn-N"][0] == 1.0

    def test_cn_pair_with_no_atoms_is_nan(self):
        """Requesting a pair whose A species exists but finds no
        neighbors vs a missing-species request."""
        f = two_atom_frame()
        cn = amcn.CoordinationNumber.from_trajectory([f], {"Zn-N": 0.5})
        assert cn.data["Zn-N"][0] == 0.0

    def test_bad_no_angles_drops_columns(self):
        f = two_atom_frame()  # one neighbor max -> no angle triplets
        bad = ambad.Bad.from_trajectory([f], {"Zn-N": 2.5}, dtheta=5.0)
        assert list(bad.data.columns) == ["theta"]

    def test_msd_two_frames(self):
        frames = [two_atom_frame(), two_atom_frame()]
        msd = ammsd.WindowMsd.from_trajectory(frames, delta_time=1, timestep=1)
        assert len(msd.data) == 1  # only window m=0
        assert msd.data["X"][0] == 0.0

    def test_ring_no_bonds(self):
        f = two_atom_frame()
        ring = amring.Ring.from_trajectory([f], {"Zn-N": 0.1})
        # no rings anywhere: dataset stays empty or has no sizes
        assert ("ring" not in ring.data
                or ring.data["ring"].shape[1] == 0)
        assert not ring.report_search["Discarded frame"].iloc[0]

    def test_missing_species_in_cutoff_raises_cleanly(self):
        f = two_atom_frame()
        with pytest.raises(KeyError):
            amcn.CoordinationNumber.from_trajectory([f], {"Xx-N": 2.0})

    def test_empty_trajectory_raises(self):
        with pytest.raises(ValueError):
            amrdf.Rdf.from_trajectory([])

    def test_unwrapped_far_atoms(self):
        """Atoms many images outside the cell must not break analyses
        (the reference had a memory-leak footgun here,
        amof/coordination/reduce.py:92-95)."""
        f = Frame([[101, 1, 1], [-97, 1, 1]], [30, 7], np.eye(3) * 8)
        rdf = amrdf.Rdf.from_trajectory([f], dr=0.2)
        peak_r = rdf.data["r"][rdf.data["Zn-N"].idxmax()]
        assert rdf.data["Zn-N"].sum() > 0
        assert peak_r == pytest.approx(2.0, abs=0.2)  # min image 2.0 apart
