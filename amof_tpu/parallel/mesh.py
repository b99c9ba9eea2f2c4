"""
Device-mesh construction for trajectory analysis.

The reference's only parallelism is joblib process pools over frames
(SURVEY.md §2 row 20). The TPU-native equivalent is a single SPMD
program over a 2-d mesh:

  * axis 'frames' — pure data parallelism over the trajectory (the
    joblib-over-frames pattern done properly); histogram partials
    psum-merge over this axis;
  * axis 'atoms'  — shards the i-atom range of the O(N^2) pair loop
    (and the atom axis of the MSD FFT), the analog of tensor/sequence
    parallelism for this workload.

Pipeline and expert parallelism have no analog here: the analyses are
single-pass reductions with no layer pipeline and no routed experts —
stated explicitly per SURVEY.md §5.7 rather than invented.

Collectives are plain psum over mesh axes; XLA lays them on ICI.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def analysis_mesh(n_devices=None, frames_axis=None) -> Mesh:
    """Build a ('frames', 'atoms') mesh over the available devices.

    Args:
        n_devices: number of devices (default: all).
        frames_axis: size of the 'frames' axis; defaults to the largest
            power-of-two divisor <= sqrt heuristic favoring frames
            (frame parallelism has zero communication until the final
            psum, so it gets the larger share).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if frames_axis is None:
        # favor the frames axis: largest divisor of n that is <= n and
        # >= n // 2 (frames get everything unless odd sharding helps)
        frames_axis = n
        atoms_axis = 1
    else:
        atoms_axis = n // frames_axis
    if frames_axis * atoms_axis != n:
        raise ValueError(
            f"mesh {frames_axis}x{atoms_axis} != {n} devices"
        )
    dev_array = np.array(devices).reshape(frames_axis, atoms_axis)
    return Mesh(dev_array, ("frames", "atoms"))


def divisible_pad(n: int, parts: int) -> int:
    """Amount of padding to make n divisible by parts."""
    return (-n) % parts
