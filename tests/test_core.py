"""Tests for the core substrate: cell math, frames, step construction."""

import numpy as np
import pytest

from amof_tpu.core import cellmath
from amof_tpu.core.frames import Frame, FrameBatch, Trajectory, as_frame_batch
from amof_tpu.core.step import construct_step


class TestCellMath:
    def test_cellpar_roundtrip(self):
        cell = cellmath.cellpar_to_cell([3.0, 4.0, 5.0, 90.0, 90.0, 90.0])
        assert np.allclose(cell, np.diag([3.0, 4.0, 5.0]))

    def test_cellpar_triclinic_roundtrip(self):
        par = [3.0, 4.0, 5.0, 70.0, 80.0, 95.0]
        cell = cellmath.cellpar_to_cell(par)
        back = cellmath.cell_lengths_and_angles(cell)
        assert np.allclose(back, par)

    def test_cell_from_any(self):
        assert np.allclose(cellmath.cell_from_any([2, 3, 4]), np.diag([2, 3, 4]))
        m = np.arange(9).reshape(3, 3) + np.eye(3)
        assert np.allclose(cellmath.cell_from_any(m), m)

    def test_volume(self):
        assert cellmath.volume(np.diag([2, 3, 4])) == pytest.approx(24.0)

    def test_min_widths_cubic(self):
        assert np.allclose(cellmath.min_widths(np.eye(3) * 5), [5, 5, 5])

    def test_wrap_positions_orthorhombic(self):
        cell = np.diag([10.0, 10.0, 10.0])
        pos = np.array([[11.0, -1.0, 5.0]])
        wrapped = cellmath.wrap_positions(pos, cell)
        assert np.allclose(wrapped, [[1.0, 9.0, 5.0]])

    def test_wrap_positions_center_zero_is_min_image(self):
        cell = np.diag([10.0, 10.0, 10.0])
        delta = np.array([[6.0, -6.0, 4.0]])
        wrapped = cellmath.wrap_positions(delta, cell, center=(0, 0, 0))
        assert np.allclose(wrapped, [[-4.0, 4.0, 4.0]])

    def test_min_image_distance_triclinic(self):
        cell = cellmath.cellpar_to_cell([6, 6, 6, 75, 85, 95])
        p1 = np.array([0.1, 0.1, 0.1]) @ cell
        # p2 = p1 + small displacement, shifted by a lattice vector
        disp = np.array([0.3, -0.2, 0.4])
        p2 = p1 + disp + cell[0] + cell[2]
        d = cellmath.min_image_distance(p1[None], p2[None], cell)
        assert d[0] == pytest.approx(np.linalg.norm(disp), abs=1e-10)


class TestFrame:
    def test_basic(self):
        f = Frame([[0, 0, 0], [1, 1, 1]], [30, 7], np.eye(3) * 5)
        assert len(f) == 2
        assert f.get_chemical_symbols() == ["Zn", "N"]
        assert f.get_volume() == pytest.approx(125.0)
        assert f.get_global_number_of_atoms() == 2

    def test_masses_and_com(self):
        f = Frame([[0, 0, 0], [2, 0, 0]], [1, 1], np.eye(3) * 10)
        assert np.allclose(f.get_center_of_mass(), [1, 0, 0])

    def test_wrap(self):
        f = Frame([[11.0, 0, 0]], [6], np.eye(3) * 10)
        f.wrap()
        assert np.allclose(f.positions, [[1.0, 0, 0]])

    def test_angles_mic(self):
        # right angle at origin atom, with one arm crossing the boundary
        cell = np.eye(3) * 10
        f = Frame([[9.5, 0, 0], [0, 0, 0], [0, 1.0, 0]], [6, 6, 6], cell)
        ang = f.get_angles([[0, 1, 2]], mic=True)
        assert ang[0] == pytest.approx(90.0)
        ang_nomic = f.get_angles([[0, 1, 2]], mic=False)
        assert ang_nomic[0] == pytest.approx(90.0)

    def test_formula_counts(self):
        f = Frame(np.zeros((3, 3)), [30, 7, 7], np.eye(3))
        assert f.formula_counts() == {"Zn": 1, "N": 2}


class TestFrameBatch:
    def test_from_frames_roundtrip(self):
        frames = [
            Frame(np.random.rand(5, 3), [1, 6, 7, 8, 30], np.eye(3) * 8)
            for _ in range(3)
        ]
        batch = FrameBatch.from_frames(frames)
        assert batch.num_frames == 3
        assert batch.num_atoms == 5
        back = batch.to_frames()
        assert np.allclose(back[1].positions, frames[1].positions, atol=1e-6)
        assert np.array_equal(back[0].numbers, frames[0].numbers)

    def test_as_frame_batch_from_trajectory(self):
        traj = Trajectory(
            [Frame(np.zeros((2, 3)), [1, 1], np.eye(3)) for _ in range(4)]
        )
        batch = as_frame_batch(traj)
        assert batch.num_frames == 4

    def test_is_pytree(self):
        import jax

        batch = FrameBatch.from_frames(
            [Frame(np.zeros((2, 3)), [1, 1], np.eye(3))]
        )
        leaves = jax.tree_util.tree_leaves(batch)
        assert len(leaves) == 4


class TestStep:
    def test_delta_step_number_of_frames(self):
        s = construct_step(delta_Step=2, first_frame=0, number_of_frames=5)
        assert np.array_equal(s, [0, 2, 4, 6, 8])

    def test_first_last(self):
        s = construct_step(delta_Step=3, first_frame=1, last_frame=10)
        assert np.array_equal(s, [1, 4, 7])

    def test_slice(self):
        s = construct_step(step=slice(0, 10, 2))
        assert np.array_equal(s, [0, 2, 4, 6, 8])

    def test_array_passthrough(self):
        s = construct_step(step=[5, 7, 11])
        assert np.array_equal(s, [5, 7, 11])

    def test_last_frame_derivation(self):
        s = construct_step(delta_Step=2, last_frame=10, number_of_frames=3)
        assert np.array_equal(s, [4, 6, 8])


class TestTrajectorySetCell:
    def test_set_cell_truncates(self):
        traj = Trajectory(
            [Frame(np.zeros((1, 3)), [1]) for _ in range(5)]
        )
        cells = [np.eye(3) * (i + 1) for i in range(3)]
        traj.set_cell(cells)
        assert len(traj) == 3
        assert traj[2].get_volume() == pytest.approx(27.0)
        assert traj[0].pbc
