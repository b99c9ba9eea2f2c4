"""Golden-value regression tests on the ZIF-4 fixture.

These pin concrete numbers produced by the current implementation (CPU,
f32 kernels) so future kernel rewrites are caught if they drift. Values
are physical: Zn-N peak at 2.0 Å, tetrahedral N-Zn-N angle, the inferred
Zn-Im network cutoff, ZIF-4's cage-only porosity.
"""

import ast

import numpy as np
import pytest

import amof_tpu.bad as ambad
import amof_tpu.coordination.reduce as amred
import amof_tpu.rdf as amrdf


class TestGoldenZif4:
    def test_rdf_golden(self, zif4_frame):
        rdf = amrdf.Rdf.from_trajectory([zif4_frame], dr=0.05)
        d = rdf.data
        i = d["Zn-N"].idxmax()
        assert d["r"][i] == pytest.approx(2.0)
        # 64 Zn-N bonds in the 2.0 Å bin of 16 Zn
        assert d["Zn-N"][i] == pytest.approx(25.0012303, rel=1e-4)
        # exclusion zone below bonding distances
        assert d["X-X"][30] == 0.0  # r = 1.5 Å sits between C-H and C-N

    def test_bad_golden(self, zif4_frame):
        bad = ambad.Bad.from_trajectory([zif4_frame], {"Zn-N": 2.5}, dtheta=0.5)
        j = bad.data["N-Zn-N"].idxmax()
        assert bad.data["theta"][j] == pytest.approx(106.25)
        assert bad.data["N-Zn-N"][j] == pytest.approx(1 / 3, rel=1e-6)

    def test_reduction_golden(self, zif4_frame):
        rt = amred.reduce_trajectory([zif4_frame], "ZIF-4")
        cutoffs = ast.literal_eval(
            rt.report_search["nb_set_and_cutoff"].iloc[0]
        )
        # longest Zn-Im center-of-mass bond in crystalline ZIF-4
        assert cutoffs["Fr-Zn"] == pytest.approx(3.2067055, rel=1e-5)
