"""Tests for trajectory I/O: xyz, cp2k, lammps, file utilities."""

import gzip
import os

import numpy as np
import pytest

import amof_tpu.files.operation as amop
import amof_tpu.files.path as ampath
import amof_tpu.trajectory as amtraj
from amof_tpu.core.frames import Frame
from amof_tpu.io.xyz import read_xyz, write_xyz
from amof_tpu.io.cp2k import read_cell_file, read_tabular
from amof_tpu.io.lammps import closest_atomic_number, read_lammps_data


class TestXyz:
    def test_roundtrip(self, tmp_path):
        frames = [
            Frame(np.random.rand(4, 3) * 5, [30, 7, 6, 1], np.eye(3) * 5)
            for _ in range(3)
        ]
        path = tmp_path / "traj.xyz"
        write_xyz(path, frames)
        back = read_xyz(path, ":")
        assert len(back) == 3
        assert np.allclose(back[1].positions, frames[1].positions)
        assert np.allclose(back[0].cell, frames[0].cell)
        assert back[2].get_chemical_symbols() == ["Zn", "N", "C", "H"]

    def test_index_forms(self, tmp_path):
        frames = [
            Frame(np.full((1, 3), float(i)), [6], np.eye(3) * 5) for i in range(6)
        ]
        path = tmp_path / "t.xyz"
        write_xyz(path, frames)
        assert read_xyz(path, 2).positions[0, 0] == 2.0
        assert read_xyz(path, -1).positions[0, 0] == 5.0
        assert len(read_xyz(path, "1:5:2")) == 2
        assert len(read_xyz(path, slice(0, 3))) == 3
        assert len(read_xyz(path, ":")) == 6

    def test_gzip(self, tmp_path):
        frame = Frame(np.zeros((1, 3)), [6], np.eye(3))
        path = str(tmp_path / "t.xyz.gz")
        write_xyz(path, frame)
        with gzip.open(path, "rt") as f:
            assert f.readline().strip() == "1"
        back = read_xyz(path, 0)
        assert len(back) == 1

    def test_reference_fixture(self, zif4_frame):
        assert len(zif4_frame) == 272
        syms = set(zif4_frame.get_chemical_symbols())
        assert syms == {"Zn", "C", "N", "H"}
        lengths = zif4_frame.get_cell_lengths_and_angles()[:3]
        assert lengths[0] == pytest.approx(15.4231, abs=1e-3)


class TestCp2k:
    def test_read_cell_file(self, cp2k_cell_file):
        cells = read_cell_file(cp2k_cell_file, index=slice(0, 10))
        assert cells.shape == (10, 3, 3)
        assert cells[0, 0, 0] == pytest.approx(15.1082545133)
        assert cells[0, 2, 2] == pytest.approx(18.0615107139)

    def test_read_tabular(self, cp2k_cell_file):
        df, units = read_tabular(cp2k_cell_file, return_units=True)
        assert df.index.name == "Step"
        assert "Volume" in df.columns
        assert units["Volume"] == "Angstrom^3"
        assert len(df) == 10000

    def test_clean_xyz_removes_duplicate_frames(self, tmp_path):
        from amof_tpu.io.cp2k import clean_xyz

        def frame(step, tag):
            return (
                "2\n"
                f" i = {step:8d}, time = {step * 0.5:12.3f}, E = -1.0\n"
                f"O {tag} 0.0 0.0\nH 0.0 {tag} 0.0\n"
            )

        # restart re-emits steps 1 and 2 with (discarded) new coordinates
        path = tmp_path / "pos.xyz"
        path.write_text(
            frame(0, 1.0) + frame(1, 2.0) + frame(2, 3.0)
            + frame(1, 9.0) + frame(2, 9.0) + frame(3, 4.0)
        )
        clean_xyz(path)
        assert path.read_text() == (
            frame(0, 1.0) + frame(1, 2.0) + frame(2, 3.0) + frame(3, 4.0)
        )

    def test_clean_xyz_no_duplicates_is_identity(self, tmp_path):
        from amof_tpu.io.cp2k import clean_xyz

        content = (
            "1\n i =        0, time =        0.000, E = -1.0\nC 0 0 0\n"
            "1\n i =        1, time =        0.500, E = -1.0\nC 1 0 0\n"
        )
        path = tmp_path / "pos.xyz"
        path.write_text(content)
        clean_xyz(path)
        assert path.read_text() == content

    def test_clean_tabular_removes_duplicates_and_headers(self, tmp_path):
        from amof_tpu.io.cp2k import clean_tabular

        header = "#   Step   Time [fs]        Volume [Angstrom^3]\n"
        rows = {s: f"   {s}    {s * 0.5:.3f}    {1000.0 + s:.4f}\n"
                for s in range(5)}
        # restart: header repeated, steps 2-3 re-emitted
        path = tmp_path / "run.cell"
        path.write_text(
            header + rows[0] + rows[1] + rows[2] + rows[3]
            + header + rows[2] + rows[3] + rows[4]
        )
        clean_tabular(path)
        assert path.read_text() == header + "".join(rows[s] for s in range(5))

    def test_read_cp2k_traj(self, tmp_path, cp2k_cell_file):
        frames = [
            Frame(np.random.rand(3, 3), [8, 1, 1]) for _ in range(5)
        ]
        xyz_path = tmp_path / "pos.xyz"
        write_xyz(xyz_path, frames)
        traj = amtraj.read_cp2k_traj(xyz_path, cp2k_cell_file, index=slice(0, 5))
        assert len(traj) == 5
        assert traj[0].pbc
        assert traj[0].get_volume() == pytest.approx(4117.6566658773, rel=1e-6)


class TestLammps:
    def test_closest_atomic_number(self):
        assert closest_atomic_number(1.0) == 1
        assert closest_atomic_number(12.011) == 6
        assert closest_atomic_number(65.4) == 30

    def test_read_data_charge(self, tmp_path):
        content = """LAMMPS data file

2 atoms
2 atom types

0.0 10.0 xlo xhi
0.0 10.0 ylo yhi
0.0 10.0 zlo zhi

Masses

1 65.38
2 14.007

Atoms

1 1 0.0 1.0 2.0 3.0
2 2 0.0 4.0 5.0 6.0
"""
        path = tmp_path / "data.lmp"
        path.write_text(content)
        frame = read_lammps_data(path, "charge")
        assert np.array_equal(frame.numbers, [30, 7])
        assert np.allclose(frame.positions, [[1, 2, 3], [4, 5, 6]])
        assert frame.get_volume() == pytest.approx(1000.0)


class TestFileUtils:
    def test_append_suffix(self):
        assert str(ampath.append_suffix("foo", "rdf")).endswith("foo.rdf")
        assert str(ampath.append_suffix("foo.rdf", "rdf")).endswith("foo.rdf")
        assert str(ampath.append_suffix("foo.bar", ".rdf")).endswith("foo.bar.rdf")

    def test_compress_decompress(self, tmp_path):
        p = tmp_path / "f.txt"
        p.write_text("hello")
        amop.compress(str(p))
        assert not p.exists()
        assert (tmp_path / "f.txt.gz").exists()
        amop.decompress(str(p))
        assert p.read_text() == "hello"

    def test_concatenate(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        a.write_text("1")
        b.write_text("2")
        out = tmp_path / "out"
        amop.concatenate([a, b], out)
        assert out.read_text() == "12"


class TestNeighborList:
    def test_simple_cubic_counts(self, simple_cubic_frame):
        import amof_tpu.atom as amatom

        # cutoff 2.5 captures exactly the 6 first neighbors at 2.0
        cutoff_dict = amatom.format_cutoff({"Ar-Ar": 2.5})
        nl = amatom.get_neighborlist(simple_cubic_frame, cutoff_dict)
        assert all(len(neigh) == 6 for neigh in nl)
        # cutoff 3.0 adds the 12 second neighbors at 2.828
        nl2 = amatom.get_neighborlist(
            simple_cubic_frame, amatom.format_cutoff({"Ar-Ar": 3.0})
        )
        assert all(len(neigh) == 18 for neigh in nl2)

    def test_nacl_pair_selectivity(self, nacl_frame):
        import amof_tpu.atom as amatom

        # Na-Cl at 2.0 only; no Na-Na/Cl-Cl cutoff specified
        nl = amatom.get_neighborlist(
            nacl_frame, amatom.format_cutoff({"Na-Cl": 2.2})
        )
        numbers = nacl_frame.get_atomic_numbers()
        for i, neigh in enumerate(nl):
            assert len(neigh) == 6
            assert all(numbers[j] != numbers[i] for j in neigh)

    def test_symbols_registry(self, tmp_path):
        from amof_tpu.symbols import DummySymbols

        ds = DummySymbols(["Zn", "Im"])
        assert ds.get_symbol("Zn") == "Zn"
        assert ds.get_symbol("Im") == "Fr"  # first 7th-period placeholder
        ds.write_to_file(tmp_path / "test")
        back = DummySymbols.from_file(tmp_path / "test")
        assert back.get_name("Fr") == "Im"
        assert back.get_symbol("Zn") == "Zn"


class TestCif:
    def test_roundtrip(self, tmp_path, zif4_frame):
        from amof_tpu.io.cif import read_cif, write_cif

        path = tmp_path / "zif4.cif"
        write_cif(path, zif4_frame)
        back = read_cif(path)
        assert len(back) == len(zif4_frame)
        assert back.get_chemical_symbols() == zif4_frame.get_chemical_symbols()
        # positions equal modulo wrapping into the cell
        from amof_tpu.core.cellmath import min_image_distance

        d = min_image_distance(back.positions, zif4_frame.positions,
                               zif4_frame.cell)
        assert np.max(d) < 1e-4

    def test_non_p1_raises(self, tmp_path):
        path = tmp_path / "sym.cif"
        path.write_text(
            "data_x\n_cell_length_a 5\n_cell_length_b 5\n_cell_length_c 5\n"
            "_cell_angle_alpha 90\n_cell_angle_beta 90\n_cell_angle_gamma 90\n"
            "_symmetry_space_group_name_H-M 'F m -3 m'\n"
        )
        from amof_tpu.io.cif import read_cif

        with pytest.raises(ValueError):
            read_cif(path)
