"""External-oracle parity tests for RDF/BAD on crystalline ZIF-4.

The golden tests elsewhere pin the implementation's own historical
outputs; these pin it to facts the implementation cannot have produced:

* published ZIF-4 crystallography — Zn-N bond length ~1.99 A (Park et
  al., PNAS 2006, CCDC ZIF-4 structure) and tetrahedral ZnN4
  coordination (CN exactly 4, N-Zn-N angles clustered on 109.5 deg);
* the asap3 normalization convention the reference consumes
  (amof/rdf.py:100-114, :216-227): partials normalized by
  N_A * N_tot * v_shell with per-frame volume weighting, under which
  4 pi rho_tot Int g_AB r^2 dr = CN_AB for EVERY ordered partial —
  checked against an independent numpy brute-force minimum-image count
  (not against the pair engine).

Any drift of the normalization (e.g. to the rho_B per-species
convention) fails the integral identity for A != B partials; any drift
of binning (bin edges, int(rmax//dr)) fails the exact shell-sum check.
"""

import numpy as np
import pytest

import amof_tpu.bad as ambad
import amof_tpu.rdf as amrdf
from amof_tpu.core.frames import Frame


def brute_force_pair_counts(frame, za, zb, r_edges):
    """Independent O(N^2) minimum-image histogram of A-B distances.

    Pure numpy, round-based minimum image (exact below half the
    minimum cell width — ZIF-4's half cell is ~7.65 A, all edges used
    here are < 3 A). Returns counts per [r_edges[k], r_edges[k+1])
    summed over A centers (self pairs excluded).
    """
    pos = np.asarray(frame.get_positions(), np.float64)
    cell = np.asarray(frame.get_cell(), np.float64)
    numbers = np.asarray(frame.get_atomic_numbers())
    ia = np.where(numbers == za)[0]
    ib = np.where(numbers == zb)[0]
    d = pos[ia][:, None, :] - pos[ib][None, :, :]
    frac = d @ np.linalg.inv(cell)
    frac -= np.round(frac)
    d = frac @ cell
    dist = np.linalg.norm(d, axis=-1)
    if za == zb:
        np.fill_diagonal(dist, np.inf)  # exclude self pairs
    return np.histogram(dist.ravel(), bins=r_edges)[0]


@pytest.fixture(scope="module")
def zif4_rdf(zif4_frame):
    # dr = 0.01 is the reference's own default (amof/rdf.py:38)
    return amrdf.Rdf.from_trajectory([zif4_frame], dr=0.01)


class TestZif4LiteratureRdf:
    def test_znn_first_peak_position(self, zif4_rdf):
        """Zn-N bond length in ZIF-4 is 1.98-2.01 A (published
        crystal structure); the first partial-RDF peak must sit there
        and be crystal-sharp."""
        data = zif4_rdf.data
        near = data[data["r"] < 2.5]
        peak_r = float(near["r"][near["Zn-N"].idxmax()])
        assert 1.90 < peak_r < 2.10
        assert float(near["Zn-N"].max()) > 10.0  # sharp crystal peak

    def test_znn_integral_is_cn4(self, zif4_rdf, zif4_frame):
        """Every Zn in ZIF-4 is tetrahedrally coordinated by exactly
        4 N: the reference-convention integral 4 pi rho_tot
        Int_0^2.5 g_ZnN r^2 dr must equal 4 (2.5 A falls in the
        zero-density gap between the first and second shells, so the
        binning edge contributes nothing)."""
        pos = np.asarray(zif4_frame.get_positions())
        vol = abs(np.linalg.det(np.asarray(zif4_frame.get_cell())))
        rho = len(pos) / vol
        cn = zif4_rdf.get_coordination_number("Zn-N", 2.5, rho)
        assert cn == pytest.approx(4.0, abs=0.05)

    def test_all_partials_integral_identity(self, zif4_rdf, zif4_frame):
        """The asap3 convention, pinned independently for EVERY ordered
        partial: summing g_AB over exact shell volumes times rho_tot
        recovers the brute-force numpy per-A neighbor count exactly,
        and the reference's Simpson 4 pi rho Int g r^2 dr form agrees
        within discretization error."""
        numbers = np.asarray(zif4_frame.get_atomic_numbers())
        vol = abs(np.linalg.det(np.asarray(zif4_frame.get_cell())))
        n_tot = len(numbers)
        rho = n_tot / vol
        data = zif4_rdf.data
        dr = 0.01
        k_cut = int(round(2.6 / dr))  # bin-edge-aligned cutoff
        r_edges = np.arange(k_cut + 1) * dr
        v_shell = 4 * np.pi / 3 * (r_edges[1:] ** 3 - r_edges[:-1] ** 3)
        from amof_tpu.data import elements

        for za in sorted(set(numbers.tolist())):
            for zb in sorted(set(numbers.tolist())):
                col = f"{elements.symbol_of(za)}-{elements.symbol_of(zb)}"
                n_a = int((numbers == za).sum())
                direct = brute_force_pair_counts(
                    zif4_frame, za, zb, r_edges
                )
                cn_direct = direct.sum() / n_a
                g = np.asarray(data[col])[:k_cut]
                # exact identity: g * rho * v_shell sums to the count
                cn_exact = float((g * v_shell).sum() * rho)
                assert cn_exact == pytest.approx(cn_direct, rel=1e-5), col
                # the reference's consuming form (Simpson over r^2 g):
                # a zero-temperature crystal's g is a train of
                # single-bin spikes, each carrying Simpson's parity
                # weight in [2/3, 4/3] (the reference documents this
                # integration weakness, amof/rdf.py:216-227 "Subjected
                # to numerical errors"), so the envelope is the bound —
                # still 20x tighter than the rho_B-vs-rho_tot
                # convention error this guards against
                cn_simpson = amrdf.get_coordination_number(
                    data["r"], data[col], k_cut * dr, rho
                )
                lo = cn_direct * (2.0 / 3.0) * 0.99 - 0.01
                hi = cn_direct * (4.0 / 3.0) * 1.01 + 0.01
                assert lo <= cn_simpson <= hi, (
                    f"{col}: simpson {cn_simpson} direct {cn_direct}"
                )

    def test_per_bin_counts_match_brute_force(self, zif4_rdf, zif4_frame):
        """Bin-resolved check of the device histogram against numpy on
        the Zn-N partial: every 0.01 A bin below 2.6 A agrees."""
        numbers = np.asarray(zif4_frame.get_atomic_numbers())
        vol = abs(np.linalg.det(np.asarray(zif4_frame.get_cell())))
        n_tot = len(numbers)
        n_zn = int((numbers == 30).sum())
        dr = 0.01
        k_cut = int(round(2.6 / dr))
        r_edges = np.arange(k_cut + 1) * dr
        v_shell = 4 * np.pi / 3 * (r_edges[1:] ** 3 - r_edges[:-1] ** 3)
        direct = brute_force_pair_counts(zif4_frame, 30, 7, r_edges)
        g_expected = direct * vol / (n_zn * n_tot * v_shell)
        g = np.asarray(zif4_rdf.data["Zn-N"])[:k_cut]
        np.testing.assert_allclose(g, g_expected, rtol=1e-4, atol=1e-6)


class TestZif4LiteratureBad:
    def test_nznn_peak_tetrahedral(self, zif4_frame):
        """ZnN4 tetrahedra: the N-Zn-N angle distribution of the
        crystal peaks near the ideal 109.47 deg (reported ZIF-4 range
        ~107-112 deg) with essentially all mass inside [95, 125]."""
        bad = ambad.Bad.from_trajectory(
            [zif4_frame], {"Zn-N": 2.5}, dtheta=0.5
        )
        data = bad.data
        w = np.asarray(data["N-Zn-N"], np.float64)
        theta = np.asarray(data["theta"], np.float64)
        assert w.sum() > 0
        peak = float(theta[int(np.argmax(w))])
        assert 104.0 < peak < 114.0
        mean = float((w * theta).sum() / w.sum())
        assert 106.0 < mean < 112.0
        inside = w[(theta > 95.0) & (theta < 125.0)].sum()
        assert inside / w.sum() > 0.95

    def test_nznn_angles_match_brute_force(self, zif4_frame):
        """Independent numpy oracle: mean and count of N-Zn-N angles
        computed directly from the ZnN4 tetrahedra (minimum-image,
        cutoff 2.5 A) match the device BAD's weighted moments."""
        pos = np.asarray(zif4_frame.get_positions(), np.float64)
        cell = np.asarray(zif4_frame.get_cell(), np.float64)
        inv = np.linalg.inv(cell)
        numbers = np.asarray(zif4_frame.get_atomic_numbers())
        zn = np.where(numbers == 30)[0]
        nn = np.where(numbers == 7)[0]
        angles = []
        for a in zn:
            d = pos[nn] - pos[a]
            f = d @ inv
            f -= np.round(f)
            d = f @ cell
            r = np.linalg.norm(d, axis=1)
            nb = d[r < 2.5]
            assert len(nb) == 4  # crystallographic fact: ZnN4
            for i in range(len(nb)):
                for j in range(i + 1, len(nb)):
                    c = nb[i] @ nb[j] / (
                        np.linalg.norm(nb[i]) * np.linalg.norm(nb[j])
                    )
                    angles.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
        angles = np.asarray(angles)
        assert len(angles) == 6 * len(zn)

        bad = ambad.Bad.from_trajectory(
            [zif4_frame], {"Zn-N": 2.5}, dtheta=0.05
        )
        w = np.asarray(bad.data["N-Zn-N"], np.float64)
        theta = np.asarray(bad.data["theta"], np.float64)
        mean_dev = (w * theta).sum() / w.sum()
        assert mean_dev == pytest.approx(angles.mean(), abs=0.05)
        var_dev = (w * (theta - mean_dev) ** 2).sum() / w.sum()
        assert np.sqrt(var_dev) == pytest.approx(angles.std(), abs=0.1)


class TestBadByCnPartialAnchor:
    """Hand-computable anchor for BadByCn's 'partial' normalization
    (amof/bad.py:287-295): per-cn histograms are density-normalized
    then weighted by (angles at that cn) / (all angles), so the sum
    over cn integrates to 1 and each cn integrates to its angle-count
    share. The fixture's shares are known by construction, independent
    of any histogram code."""

    def two_cn_frame(self):
        """One Zn with two N at 90 deg (cn=2, 1 angle) and one Zn with
        three in-plane N 120 deg apart (cn=3, 3 angles). Big cell, no
        image ambiguity. Partial weights must be exactly 1/4 and 3/4."""
        d = 2.0
        pos = [
            [5.0, 5.0, 5.0],            # Zn (cn=2)
            [5.0 + d, 5.0, 5.0],        # N
            [5.0, 5.0 + d, 5.0],        # N -> one 90 deg angle
            [20.0, 20.0, 20.0],         # Zn (cn=3)
        ]
        for k in range(3):
            ang = 2 * np.pi * k / 3
            pos.append([20.0 + d * np.cos(ang), 20.0 + d * np.sin(ang), 20.0])
        species = [30, 7, 7, 30, 7, 7, 7]
        return Frame(np.array(pos), species, np.eye(3) * 40.0)

    def test_partial_weights_and_peaks(self):
        frame = self.two_cn_frame()
        dtheta = 0.5
        bad = ambad.BadByCn.from_trajectory(
            [frame], {"Zn-N": 2.2}, dtheta=dtheta, normalization="partial"
        )
        arr = bad.data["bad"]
        # both species carry cutoffs, so the reference's "X" wildcard
        # triples are enumerated too (amof/bad.py:251-258)
        assert "N-Zn-N" in list(arr.get_coord("atom_triple"))
        assert list(arr.get_coord("cn")) == [2, 3]
        row2 = np.asarray(arr.sel(atom_triple="N-Zn-N", cn=2), np.float64)
        row3 = np.asarray(arr.sel(atom_triple="N-Zn-N", cn=3), np.float64)
        theta = np.asarray(arr.get_coord("theta"), np.float64)
        # integral of each partial = its share of the 4 angles
        assert row2.sum() * dtheta == pytest.approx(0.25, rel=1e-6)
        assert row3.sum() * dtheta == pytest.approx(0.75, rel=1e-6)
        # all mass at the constructed angles
        assert theta[np.argmax(row2)] == pytest.approx(90.0, abs=dtheta)
        assert theta[np.argmax(row3)] == pytest.approx(120.0, abs=dtheta)
        assert row2[np.abs(theta - 90.0) > dtheta].sum() == 0
        assert row3[np.abs(theta - 120.0) > dtheta].sum() == 0

    def test_total_normalization_rows_are_densities(self):
        frame = self.two_cn_frame()
        dtheta = 0.5
        bad = ambad.BadByCn.from_trajectory(
            [frame], {"Zn-N": 2.2}, dtheta=dtheta, normalization="total"
        )
        arr = bad.data["bad"]
        for cn in (2, 3):
            row = np.asarray(arr.sel(atom_triple="N-Zn-N", cn=cn), np.float64)
            assert row.sum() * dtheta == pytest.approx(1.0, rel=1e-6)


class TestMechCsvIsotropicAnchor:
    """Closed-form anchor for MechanicalProperties / '.mech.csv'
    (amof/elastic/core.py:247-277): an isotropic stiffness matrix with
    Lame parameters lambda=50, mu=30 GPa has textbook moduli
    K = lambda + 2mu/3 = 70, G = mu = 30, E = 9KG/(3K+G) = 78.75,
    nu = (3K-2G)/(2(3K+G)) = 0.3125, identical under Voigt, Reuss and
    Hill averaging. Any drift in ELATE averaging or the CSV column /
    index conventions fails this."""

    LAM, MU = 50.0, 30.0

    def iso_C(self):
        lam, mu = self.LAM, self.MU
        C = np.zeros((6, 6))
        C[:3, :3] = lam
        C[0, 0] = C[1, 1] = C[2, 2] = lam + 2 * mu
        C[3, 3] = C[4, 4] = C[5, 5] = mu
        return C.tolist()

    def test_averages_match_closed_form(self):
        from amof_tpu.elastic.core import MechanicalProperties

        mech = MechanicalProperties.from_elastic(self.iso_C())
        df = mech.data
        assert list(df.index) == ["voigt", "reuss", "hill"]
        assert list(df.columns) == [
            "bulk_modulus", "youngs_modulus", "shear_modulus",
            "poissons_ratio",
        ]
        assert df.index.name == "averaging_scheme"
        K = self.LAM + 2 * self.MU / 3
        G = self.MU
        E = 9 * K * G / (3 * K + G)
        nu = (3 * K - 2 * G) / (2 * (3 * K + G))
        for scheme in ("voigt", "reuss", "hill"):
            assert df.loc[scheme, "bulk_modulus"] == pytest.approx(K, rel=1e-9)
            assert df.loc[scheme, "shear_modulus"] == pytest.approx(G, rel=1e-9)
            assert df.loc[scheme, "youngs_modulus"] == pytest.approx(E, rel=1e-9)
            assert df.loc[scheme, "poissons_ratio"] == pytest.approx(nu, rel=1e-9)

    def test_mech_csv_roundtrip(self, tmp_path):
        from amof_tpu.elastic.core import MechanicalProperties

        mech = MechanicalProperties.from_elastic(self.iso_C())
        mech.write(tmp_path / "example")
        assert (tmp_path / "example.mech.csv").exists()
        back = MechanicalProperties.from_file(tmp_path / "example")
        assert list(back.data.index) == ["voigt", "reuss", "hill"]
        np.testing.assert_allclose(
            back.data.to_numpy(), mech.data.to_numpy(), rtol=1e-12
        )
