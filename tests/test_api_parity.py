"""Machine-checked API-parity manifest vs the reference.

Every public module-level symbol of the reference package (amof v1.1.0)
must have an amof_tpu equivalent at the SAME name, and the analysis
classes must carry the reference's public methods. Documented
exclusions at the bottom are surface the reference itself never reaches
from the amof path (SURVEY.md §2 row 11).
"""

import importlib

import pytest

# reference module -> (amof_tpu module, [public symbols])
MODULE_SYMBOLS = {
    "atom": ("amof_tpu.atom", [
        "get_density", "get_number_density", "get_total_mass",
        "select_species_positions", "get_atomic_numbers_unique",
        "format_cutoff", "get_neighborlist",
    ]),
    "bad": ("amof_tpu.bad", ["CoreBad", "Bad", "BadByCn"]),
    "cn": ("amof_tpu.cn", ["CoordinationNumber"]),
    "coordination.buildingunits": ("amof_tpu.coordination.buildingunits", [
        "BuildingUnit", "Node", "SingleMetal", "Linker",
        "ImidazoleBased", "ImidazoleCycle",
    ]),
    "coordination.core": ("amof_tpu.coordination.core", [
        "SearchError", "CoordinationSearch", "NotImplementedSearch",
    ]),
    "coordination.reduce": ("amof_tpu.coordination.reduce", [
        "reduce_trajectory", "reduce_trajectory_core", "with_timeout",
        "reduce_atom",
    ]),
    "coordination.zif": ("amof_tpu.coordination.zif", [
        "ZifSearch", "MetalmIm", "MetalIm", "MetalCycle",
    ]),
    "elastic.core": ("amof_tpu.elastic.core", [
        "ElasticConstant", "MechanicalProperties", "print_Cmat",
    ]),
    "elastic.elate": ("amof_tpu.elastic.elate", ["Elastic", "ElasticOrtho"]),
    "files.cp2k": ("amof_tpu.files.cp2k", [
        "clean_xyz", "clean_tabular", "read_tabular",
    ]),
    "files.lammps": ("amof_tpu.files.lammps", ["remove_duplicate_timesteps"]),
    "files.molsys": ("amof_tpu.files.molsys", ["DummyMol", "write_mfpx"]),
    "files.operation": ("amof_tpu.files.operation", [
        "compress", "decompress", "concatenate",
    ]),
    "files.path": ("amof_tpu.files.path", ["append_suffix"]),
    "msd": ("amof_tpu.msd", ["Msd", "DirectMsd", "WindowMsd"]),
    "plot": ("amof_tpu.plot", ["save_hvplot"]),
    "pore.core": ("amof_tpu.pore.core", ["Pore"]),
    "pore.pysimmzeopp": ("amof_tpu.pore.pysimmzeopp", ["network"]),
    "rdf": ("amof_tpu.rdf", [
        "Rdf", "CoordinationNumber", "get_coordination_number",
        "RdfPlotter",
    ]),
    "ring.core": ("amof_tpu.ring.core", ["Ring"]),
    "structure": ("amof_tpu.structure", ["get_center_of_mass"]),
    "symbols": ("amof_tpu.symbols", ["DummySymbols"]),
    "trajectory": ("amof_tpu.trajectory", [
        "Trajectory", "ReducedTrajectory", "read_lammps_data",
        "read_lammps_traj", "read_cp2k_traj", "apply_to_traj",
        "get_density", "get_number_density", "construct_step",
        "get_delta_pos",
    ]),
}

# (amof_tpu module, class) -> reference public methods that must exist
CLASS_METHODS = {
    ("amof_tpu.rdf", "Rdf"): [
        "from_trajectory", "from_rdf", "from_file", "compute_rdf",
        "write_to_file", "get_coordination_number",
    ],
    ("amof_tpu.bad", "Bad"): [
        "from_trajectory", "from_file", "bad_BAB", "compute_bad",
        "write_to_file",
    ],
    ("amof_tpu.bad", "BadByCn"): [
        "from_trajectory", "from_file", "compute_bad", "write_to_file",
    ],
    ("amof_tpu.cn", "CoordinationNumber"): [
        "from_trajectory", "compute_cn", "from_file", "write_to_file",
    ],
    ("amof_tpu.msd", "WindowMsd"): [
        "from_trajectory", "compute_msd_of_m", "compute_msd",
        "write_to_file", "from_file",
    ],
    ("amof_tpu.msd", "DirectMsd"): [
        "from_trajectory", "compute_species_msd", "compute_msd",
    ],
    ("amof_tpu.pore.core", "Pore"): [
        "from_trajectory", "compute_surface_volume", "read_zeopp",
        "get_surface_volume", "write_to_file", "from_file",
    ],
    ("amof_tpu.ring.core", "Ring"): [
        "from_trajectory", "from_reduced_trajectory", "compute_ring",
        "read_rings_output", "write_to_file", "from_file",
    ],
    ("amof_tpu.elastic.core", "ElasticConstant"): [
        "from_cell", "set_h", "cummean", "set_volume", "set_epsilons",
        "set_every_C", "set_final_C", "write", "from_file",
    ],
    ("amof_tpu.elastic.core", "MechanicalProperties"): [
        "from_elastic", "compute_averages", "from_file", "write",
    ],
    ("amof_tpu.elastic.elate", "Elastic"): ["averages"],
    ("amof_tpu.coordination.core", "CoordinationSearch"): [
        "create_fragment", "add_to_fragment", "merge_fragments",
        "reduce_structure", "write_mfpx", "get_atype", "update_atypes",
        "get_covdist", "add_ABbonds", "find_rings",
        "get_chain_decomposition", "find_one_cycle_per_node",
        "are_circularly_identical", "assign_B_uniquely_to_A_N_coordinated",
        "find_N_closest_cov_dist",
    ],
    ("amof_tpu.coordination.zif", "ZifSearch"): ["find_ABAcycles"],
    ("amof_tpu.coordination.zif", "MetalIm"): [
        "detect_conn", "is_reduced_structure_valid",
    ],
    ("amof_tpu.symbols", "DummySymbols"): [
        "add_names", "get_symbol", "get_name", "from_file",
        "write_to_file",
    ],
    ("amof_tpu.trajectory", "ReducedTrajectory"): [
        "from_file", "write_to_file", "sample",
    ],
    ("amof_tpu.trajectory", "Trajectory"): [
        "from_traj", "from_lammps_data", "get_index_closest", "set_cell",
        "get_traj",
    ],
}

# Reference surface deliberately NOT mirrored, with the reason:
#   elastic/elate.py HTML/plotly report + Materials-Project query
#   (~60% of the vendored fork: removeHTMLTags ... POISSON3D,
#   queryMaterials, ELATE_MaterialsProject) and its scipy wrapper
#   helpers (minimize/maximize/dirVec*) are never reached from the
#   amof path (only Elastic(...).averages() is,
#   amof/elastic/core.py:253-254); our optimizer internals are
#   snake_case equivalents.
#   files/molsys.py write_body is an internal of write_mfpx.


@pytest.mark.parametrize("ref_mod", sorted(MODULE_SYMBOLS))
def test_module_symbols(ref_mod):
    mod_name, symbols = MODULE_SYMBOLS[ref_mod]
    mod = importlib.import_module(mod_name)
    missing = [s for s in symbols if not hasattr(mod, s)]
    assert not missing, f"{mod_name} lacks {missing} (reference {ref_mod})"


@pytest.mark.parametrize("key", sorted(CLASS_METHODS, key=str))
def test_class_methods(key):
    mod_name, cls_name = key
    cls = getattr(importlib.import_module(mod_name), cls_name)
    missing = [m for m in CLASS_METHODS[key] if not hasattr(cls, m)]
    assert not missing, f"{mod_name}.{cls_name} lacks {missing}"


class TestCompatBehavior:
    """The compatibility methods do what the reference's do."""

    def test_bad_BAB_right_angle(self):
        import numpy as np

        from amof_tpu.bad import Bad
        from amof_tpu.core.frames import Frame

        f = Frame([[5, 5, 5], [6.5, 5, 5], [5, 6.5, 5]],
                  [30, 7, 7], np.eye(3) * 10.0)
        nl = {0: [1, 2], 1: [0], 2: [0]}
        angles = Bad.bad_BAB(f, 30, 7, nl)
        assert len(angles) == 1
        assert angles[0] == pytest.approx(90.0, abs=1e-5)
        # wildcard center+outer finds the same triplet plus N-centered none
        assert len(Bad.bad_BAB(f, "X", "X", nl)) == 1

    def test_compute_msd_of_m_matches_definition(self):
        import numpy as np

        from amof_tpu.msd import WindowMsd

        rng = np.random.default_rng(0)
        n, atoms = 24, 5
        delta = rng.normal(size=(n, atoms, 3))
        pos = np.cumsum(delta, axis=0)  # unwrapped positions
        for m in (1, 3, 7):
            got = WindowMsd.compute_msd_of_m(delta, m)
            # definition, with the reference's skipped-origin quirk:
            # the k=m origin contributes a ZERO that still counts in
            # the mean's denominator (amof/msd.py:196-205)
            want = sum(
                np.sum((pos[k] - pos[k - m]) ** 2) / atoms
                for k in range(m + 1, n)
            ) / (n - m)
            assert got == pytest.approx(want, rel=1e-10)

    def test_read_zeopp(self, tmp_path):
        from amof_tpu.pore.core import Pore

        p = tmp_path / "atom.sa"
        p.write_text(
            "@ atom.sa Unitcell_volume: 4035.69 Density: 1.2 "
            "ASA_A^2: 1218.96 ASA_m^2/cm^3: 3020.26 ASA_m^2/g: 2485.8 "
            "NASA_A^2: 0 NASA_m^2/cm^3: 0 NASA_m^2/g: 0\n"
        )
        d = Pore.read_zeopp(str(p))
        assert d["ASA_A^2"] == pytest.approx(1218.96)
        assert d["NASA_m^2/g"] == 0.0
        assert "Unitcell_volume" not in d  # first 6 tokens dropped

    def test_read_rings_output(self, tmp_path):
        import numpy as np

        from amof_tpu.ring.core import Ring

        (tmp_path / "RINGS-res-3.dat").write_text(
            "# Number of rings with n >  10 nodes which potentialy "
            "exist: 2.0\n"
        )
        (tmp_path / "RINGS-res-5.dat").write_text(
            "# Primitive rings\n"
            "# n  RC(n)  PN(n)  Pmax(n)  Pmin(n)\n"
            "4 1.0 0.5 0.25 0.125\n"
            "5 2.0 1.0 0.5 0.25\n"
        )
        arr, undiscovered = Ring().read_rings_output(tmp_path)
        assert undiscovered == 2
        assert list(arr.coords["ring_var"]) == ["RC", "PN", "Pmax", "Pmin"]
        np.testing.assert_allclose(
            arr.sel(ring_size=5).values, [2.0, 1.0, 0.5, 0.25]
        )

    def test_add_ABbonds_builds_species_bond_graph(self, zif4_frame):
        from amof_tpu.coordination.zif import MetalIm

        search = MetalIm(zif4_frame, "Zn")
        fresh = [set() for _ in range(len(zif4_frame))]
        search.add_ABbonds(fresh, "c", "n")
        search.add_ABbonds(fresh, "c", "c")
        assert fresh == search.species_bond_graph([("c", "n"), ("c", "c")])
        assert sum(len(s) for s in fresh) > 0

    def test_cummean(self):
        import numpy as np

        from amof_tpu.elastic.core import ElasticConstant

        np.testing.assert_allclose(
            ElasticConstant.cummean([1.0, 2.0, 3.0]), [1.0, 1.5, 2.0]
        )
