"""General-format trajectory reading (VERDICT item 7): native LAMMPS
dumps, VASP POSCAR/XDATCAR, format sniffing in read_traj, gzip + index
everywhere (reference behavior: ASE-backed Trajectory.from_traj,
amof/trajectory.py:38-60)."""

import gzip

import numpy as np
import pytest

from amof_tpu.io.lammps import read_lammps_dump
from amof_tpu.io.vasp import read_poscar, read_xdatcar
from amof_tpu.trajectory import read_traj

DUMP_ORTHO = """\
ITEM: TIMESTEP
0
ITEM: NUMBER OF ATOMS
3
ITEM: BOX BOUNDS pp pp pp
0.0 10.0
0.0 12.0
0.0 14.0
ITEM: ATOMS id type x y z
2 1 1.0 2.0 3.0
1 2 4.0 5.0 6.0
3 1 7.0 8.0 9.0
ITEM: TIMESTEP
100
ITEM: NUMBER OF ATOMS
3
ITEM: BOX BOUNDS pp pp pp
0.0 10.0
0.0 12.0
0.0 14.0
ITEM: ATOMS id type x y z
1 2 4.1 5.1 6.1
2 1 1.1 2.1 3.1
3 1 7.1 8.1 9.1
"""

DUMP_TRICLINIC_SCALED = """\
ITEM: TIMESTEP
0
ITEM: NUMBER OF ATOMS
2
ITEM: BOX BOUNDS xy xz yz pp pp pp
0.0 11.0 1.0
0.0 12.0 0.5
0.0 14.0 0.0
ITEM: ATOMS id element xs ys zs
1 Zn 0.5 0.5 0.5
2 N 0.25 0.0 0.0
"""

POSCAR = """\
ZIF toy
1.0
10.0 0.0 0.0
0.0 12.0 0.0
0.0 0.0 14.0
Zn N
1 2
Direct
0.5 0.5 0.5
0.25 0.0 0.0
0.0 0.25 0.0
"""

XDATCAR = """\
toy
1.0
10.0 0.0 0.0
0.0 10.0 0.0
0.0 0.0 10.0
Zn N
1 1
Direct configuration=     1
0.1 0.2 0.3
0.4 0.5 0.6
Direct configuration=     2
0.15 0.25 0.35
0.45 0.55 0.65
"""


class TestLammpsDump:
    def test_ortho_id_sorted(self, tmp_path):
        p = tmp_path / "dump.ortho"
        p.write_text(DUMP_ORTHO)
        frames = read_lammps_dump(str(p))
        assert len(frames) == 2
        f0 = frames[0]
        # rows re-ordered by id: atom 1 (type 2) first
        np.testing.assert_allclose(f0.positions[0], [4.0, 5.0, 6.0])
        np.testing.assert_allclose(f0.positions[1], [1.0, 2.0, 3.0])
        assert f0.numbers.tolist() == [2, 1, 1]  # raw types, no specorder
        np.testing.assert_allclose(f0.cell, np.diag([10.0, 12.0, 14.0]))
        assert frames[0].step == 0 and frames[1].step == 100

    def test_specorder(self, tmp_path):
        p = tmp_path / "dump.spec"
        p.write_text(DUMP_ORTHO)
        f0 = read_lammps_dump(str(p), index=0, specorder=["C", "Zn"])
        assert f0.numbers.tolist() == [30, 6, 6]

    def test_triclinic_scaled_element(self, tmp_path):
        p = tmp_path / "tilt.lammpstrj"
        p.write_text(DUMP_TRICLINIC_SCALED)
        f = read_lammps_dump(str(p), index=0)
        # bounds: xlo = 0 - min(0, xy=1, xz=.5, 1.5) = 0; xhi = 11 - 1.5 = 9.5
        expected_cell = np.array([
            [9.5, 0.0, 0.0],
            [1.0, 12.0, 0.0],
            [0.5, 0.0, 14.0],
        ])
        np.testing.assert_allclose(f.cell, expected_cell)
        np.testing.assert_allclose(
            f.positions[0], 0.5 * expected_cell.sum(axis=0)
        )
        assert f.numbers.tolist() == [30, 7]

    def test_gzip_and_index(self, tmp_path):
        p = tmp_path / "dump.gz"
        with gzip.open(p, "wt") as f:
            f.write(DUMP_ORTHO)
        frames = read_lammps_dump(str(p), index="1:")
        assert len(frames) == 1 and frames[0].step == 100


class TestVasp:
    def test_poscar(self, tmp_path):
        p = tmp_path / "POSCAR"
        p.write_text(POSCAR)
        f = read_poscar(str(p))
        assert f.numbers.tolist() == [30, 7, 7]
        np.testing.assert_allclose(f.positions[0], [5.0, 6.0, 7.0])
        np.testing.assert_allclose(f.positions[1], [2.5, 0.0, 0.0])

    def test_poscar_cartesian_selective(self, tmp_path):
        text = POSCAR.replace("Direct", "Selective dynamics\nCartesian")
        p = tmp_path / "CONTCAR"
        p.write_text(text)
        f = read_poscar(str(p))
        np.testing.assert_allclose(f.positions[0], [0.5, 0.5, 0.5])

    def test_xdatcar(self, tmp_path):
        p = tmp_path / "XDATCAR"
        p.write_text(XDATCAR)
        frames = read_xdatcar(str(p))
        assert len(frames) == 2
        np.testing.assert_allclose(frames[0].positions[0], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(frames[1].positions[1], [4.5, 5.5, 6.5])
        assert frames[0].numbers.tolist() == [30, 7]

    def test_xdatcar_npt_repeated_header(self, tmp_path):
        header, conf1, conf2 = (
            XDATCAR.split("Direct configuration")[0],
            "Direct configuration=     1\n0.1 0.2 0.3\n0.4 0.5 0.6\n",
            "Direct configuration=     2\n0.15 0.25 0.35\n0.45 0.55 0.65\n",
        )
        p = tmp_path / "XDATCAR"
        p.write_text(header + conf1 + header.replace("10.0 0.0", "11.0 0.0", 1) + conf2)
        frames = read_xdatcar(str(p))
        assert len(frames) == 2
        np.testing.assert_allclose(frames[1].positions[0][0], 0.15 * 11.0)


class TestReadTrajDispatch:
    def test_sniff_dump_by_content(self, tmp_path):
        p = tmp_path / "unnamed.txt"
        p.write_text(DUMP_ORTHO)
        traj = read_traj(str(p))
        assert len(traj.get_traj()) == 2

    def test_sniff_poscar_by_name(self, tmp_path):
        p = tmp_path / "POSCAR-zif"
        p.write_text(POSCAR)
        traj = read_traj(str(p))
        assert len(traj.get_traj()) == 1
        assert traj.get_traj()[0].numbers.tolist() == [30, 7, 7]

    def test_explicit_format_with_index(self, tmp_path):
        p = tmp_path / "traj.lammpstrj"
        p.write_text(DUMP_ORTHO)
        traj = read_traj(str(p), index=1, format="lammps-dump-text")
        assert len(traj.get_traj()) == 1 and traj.get_traj()[0].step == 100

    def test_xyz_still_default(self, tmp_path):
        p = tmp_path / "a.xyz"
        p.write_text("2\nLattice=\"5 0 0 0 5 0 0 0 5\"\nZn 0 0 0\nN 1 1 1\n")
        traj = read_traj(str(p))
        assert traj.get_traj()[0].numbers.tolist() == [30, 7]

    def test_unknown_raises_naming_ase(self, tmp_path):
        """Unknown formats route to the optional ASE bridge; without
        ase installed the error names the fallback and the native
        formats (amof/trajectory.py:38-60 breadth policy)."""
        import builtins

        p = tmp_path / "garbage.bin"
        p.write_text("not a trajectory\nat all\n")
        try:
            import ase  # noqa: F401

            has_ase = True
        except ImportError:
            has_ase = False
        if has_ase:
            pytest.skip("ase installed; the raise path is inactive")
        with pytest.raises(ValueError, match="ASE fallback"):
            read_traj(str(p))
        with pytest.raises(ValueError, match="pdb"):
            read_traj(str(p), format="pdb")

    def test_ase_bridge_conversion(self, tmp_path, monkeypatch):
        """With ase importable, unknown formats read through
        ase.io.read and convert Atoms -> Frame (exercised with a stub
        ase module so the test runs without the real dependency)."""
        import sys
        import types

        class FakeAtoms:
            def get_positions(self):
                return np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])

            def get_atomic_numbers(self):
                return np.array([30, 7])

            def get_cell(self):
                return np.eye(3) * 9.0

            def get_pbc(self):
                return np.array([True, True, True])

        calls = {}

        def fake_read(filename, index=None, **kw):
            calls["args"] = (filename, index, kw)
            return [FakeAtoms(), FakeAtoms()]

        ase_mod = types.ModuleType("ase")
        io_mod = types.ModuleType("ase.io")
        io_mod.read = fake_read
        ase_mod.io = io_mod
        monkeypatch.setitem(sys.modules, "ase", ase_mod)
        monkeypatch.setitem(sys.modules, "ase.io", io_mod)

        p = tmp_path / "md.traj"
        p.write_text("binary-ish placeholder")
        traj = read_traj(str(p), format="traj")
        frames = traj.get_traj()
        assert len(frames) == 2
        assert frames[0].numbers.tolist() == [30, 7]
        assert frames[0].cell[0, 0] == 9.0
        assert calls["args"][2]["format"] == "traj"
