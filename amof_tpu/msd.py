"""
Mean-Squared Displacement.

API parity with amof/msd.py: ``WindowMsd.from_trajectory(traj,
delta_time=100, max_time='half', timestep=1, parallel, unwrap)`` :157
with the same window construction :174-182, per-species columns and the
formula-weighted total column 'X' :258-268, the min-image displacement
decomposition / unwrap / COM-drift pipeline :222-242, and the
'.msd' feather round-trip :30-51. ``DirectMsd`` :54-137 (deprecated,
orthogonal cells) is provided for completeness.

The per-window rolling-sum loop is replaced by on-device FFT
autocorrelation (amof_tpu/ops/msd_kernel.py), turning the O(T x M)
reference algorithm into O(T log T) over the whole window range. The
reference's origin-skipping estimator is reproduced bit-for-bit in
expectation via ``origin_policy='amof'`` (see the kernel docstring).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

import amof_tpu.files.path
from amof_tpu.core.frames import as_frame_batch
from amof_tpu.data import elements
from amof_tpu.ops import msd_kernel

logger = logging.getLogger(__name__)


class Msd:
    """Base class: '.msd' feather persistence (amof/msd.py:25-51)."""

    def write_to_file(self, path_to_output):
        path_to_output = amof_tpu.files.path.append_suffix(path_to_output, "msd")
        self.data.to_feather(path_to_output)

    @classmethod
    def from_msd(cls, *args):
        logger.exception("from_msd is deprecated, use from_file instead")

    @classmethod
    def from_file(cls, path_to_msd):
        msd_class = cls()
        msd_class.read_msd_file(path_to_msd)
        return msd_class

    def read_msd_file(self, path_to_data):
        path_to_data = amof_tpu.files.path.append_suffix(path_to_data, "msd")
        self.data = pd.read_feather(path_to_data)


class WindowMsd(Msd):
    """Windowed MSD:
    MSD(m) = <|r_i(k+m) - r_i(k)|^2>_{i,k}, x-axis 'Time' in fs."""

    def __init__(self):
        self.data = pd.DataFrame({"Time": np.empty([0])})

    @classmethod
    def from_trajectory(
        cls, trajectory, delta_time=100, max_time="half", timestep=1,
        parallel=False, unwrap=False, origin_policy="amof",
    ):
        """Args:
            delta_time: time between two computed MSD values (fs).
            max_time: int (fs) or 'half' (= half the simulation length;
                larger values are clamped to it).
            timestep: time between two frames (fs).
            unwrap: unwrap the trajectory first (use when the MD code
                wrapped positions without keeping the COM constant).
            origin_policy: 'amof' replicates the reference estimator
                (skips the k=0 origin); 'standard' keeps all origins.
        """
        msd_class = cls()
        batch = as_frame_batch(trajectory)
        half_time = (batch.num_frames // 2) * timestep
        if max_time == "half" or max_time > half_time:
            max_time = half_time
        if delta_time < timestep:
            # the reference only logs here and then crashes on a
            # zero-step arange; fail fast instead
            raise ValueError("delta_time should be larger than timestep")
        delta_m = delta_time // timestep
        window = np.arange(0, max_time // timestep, delta_m)
        time = timestep * window
        msd_class.compute_msd(batch, window, time, parallel, unwrap, origin_policy)
        return msd_class

    @staticmethod
    def compute_msd_of_m(delta_pos, m):
        """Windowed MSD(m) by the reference's rolling-sum recurrence
        (amof/msd.py:186-205) — including its skipped first origin
        (origin_policy='amof'). Kept as a numpy oracle for the FFT
        path and for API parity."""
        delta_pos = np.asarray(delta_pos, dtype=np.float64)
        n = len(delta_pos)
        partial = np.zeros(n - m)
        r_lag = delta_pos[0].copy()
        r_k = delta_pos[: m + 1].sum(axis=0)
        for k in range(m + 1, n):
            r_k = r_k + delta_pos[k]
            r_lag = r_lag + delta_pos[k - m]
            partial[k - m] = (
                np.linalg.norm(r_k - r_lag) ** 2 / len(r_lag)
            )
        return float(np.mean(partial))

    def compute_msd(self, batch, window, time, parallel=False, unwrap=False,
                    origin_policy="amof"):
        del parallel  # species are computed on device in one pass each
        species = np.asarray(batch.species)
        unique = sorted(set(species.tolist()))
        positions = np.asarray(batch.positions)
        cells = np.asarray(batch.cell)
        masses = elements.mass_of(species).astype(positions.dtype)

        logger.info(
            "Start computing msd at %s times on a trajectory of %s frames",
            len(window), batch.num_frames,
        )
        if unwrap:
            logger.info("Unwrap trajectory before computing msd")
            positions = msd_kernel.unwrap_positions(positions, cells)
        positions = msd_kernel.remove_com_drift(positions, masses)

        self.data = pd.DataFrame({"Time": time})
        window = np.asarray(window)
        counts = {}
        for z in unique:
            sel = species == z
            counts[elements.symbol_of(z)] = int(sel.sum())
            xs = msd_kernel.unwrap_positions(positions[:, sel], cells)
            msd_all_m = np.asarray(
                msd_kernel.windowed_msd_all_m(xs, origin_policy)
            )
            self.data[elements.symbol_of(z)] = msd_all_m[window]
        # formula-weighted total (amof/msd.py:263-268)
        total = sum(
            self.data[sym] * cnt for sym, cnt in counts.items()
        ) / sum(counts.values())
        self.data["X"] = total


class DirectMsd(Msd):
    """Direct MSD vs frame 0 (deprecated; orthogonal cells only —
    parity: amof/msd.py:54-137)."""

    def __init__(self):
        self.data = pd.DataFrame({"Step": np.empty([0])})
        logger.warning(
            "DirectMsd is deprecated and not suitable for non-orthogonal "
            "cells, use WindowMsd instead"
        )

    @classmethod
    def from_trajectory(cls, trajectory, delta_Step=1, first_frame=0,
                        parallel=False):
        import amof_tpu.trajectory as amtraj

        msd_class = cls()
        batch = as_frame_batch(trajectory)
        step = amtraj.construct_step(
            delta_Step=delta_Step, first_frame=first_frame,
            number_of_frames=batch.num_frames,
        )
        msd_class.compute_msd(batch, step, parallel)
        return msd_class

    def compute_species_msd(self, trajectory, atomic_number=None):
        """Direct MSD of one species vs frame 0 (parity:
        amof/msd.py:84-108; orthogonal cells only)."""
        from amof_tpu.core.frames import as_frame_batch

        batch = as_frame_batch(trajectory)
        positions = np.asarray(batch.positions)
        cells = np.asarray(batch.cell)
        if atomic_number is not None:
            sel = np.asarray(batch.species) == atomic_number
            positions = positions[:, sel]
        return self._species_msd(positions, cells)

    @staticmethod
    def _species_msd(positions, cells):
        """Reference per-axis modulo unwrap + MSD vs frame 0
        (amof/msd.py:84-107 semantics, vectorized)."""
        n_frames, n_atoms, _ = positions.shape
        msd = np.zeros(n_frames)
        r_0 = positions[0].astype(np.float64)
        r_t = r_0.copy()
        for t in range(1, n_frames):
            a = np.diag(cells[t].astype(np.float64))
            dr = positions[t].astype(np.float64) - (r_t % a)
            dr -= a * (dr > a / 2)
            dr += a * (dr < -a / 2)
            r_t = r_t + dr
            msd[t] = np.linalg.norm(r_t - r_0) ** 2 / n_atoms
        return msd

    def compute_msd(self, batch, step, parallel=False):
        del parallel
        species = np.asarray(batch.species)
        unique = sorted(set(species.tolist()))
        positions = np.asarray(batch.positions)
        cells = np.asarray(batch.cell)

        self.data = pd.DataFrame({"Step": step})
        self.data["X"] = self._species_msd(positions, cells)
        for z in unique:
            sel = species == z
            self.data[elements.symbol_of(z)] = self._species_msd(
                positions[:, sel], cells
            )
