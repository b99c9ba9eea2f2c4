"""
On-device bond-angle distribution kernel.

Replaces the reference's per-frame Python triplet loop + ASE
``get_angles(mic=True)`` (amof/bad.py:71-101) with a fused device pass:
fixed-capacity neighbor tables -> all neighbor-slot pairs -> minimum-image
angles -> histogram, resolved by (spec, coordination-number, theta-bin) so
one pass serves both ``Bad`` (sum over the cn axis) and ``BadByCn``.

Spec encoding: each requested triple B-A-B is (a, b) with a the center
species index and b the outer species index, -1 meaning the "X" wildcard
(amof/bad.py:122-133 enumeration).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from amof_tpu.ops.pair_engine import frame_neighbor_table, min_image_delta


@functools.partial(
    jax.jit,
    static_argnames=("specs", "bins", "max_neighbors", "chunk", "n_i"),
)
def frame_bad_counts(
    positions,  # [N, 3] padded
    cell,  # [3, 3]
    species_idx,  # [N], -1 padding
    cutoff_matrix,  # [S, S]
    specs: Tuple[Tuple[int, int], ...],  # ((a, b), ...), -1 = wildcard
    dtheta: float,
    bins: int,  # number of theta bins (reference: int(180//dtheta) + 1)
    max_neighbors: int = 24,
    chunk: int = 256,
    i_start=0,
    n_i: int = None,
):
    """Angle histogram of one frame.

    ``i_start``/``n_i`` restrict the center atoms to an i-slice (atom-axis
    sharding; see pair_engine.frame_rdf_counts).

    Returns:
        counts f32[n_specs, max_neighbors+1, bins]: angle counts per spec,
            per coordination number (number of B-species neighbors of the
            center), per theta bin.
        overflow bool[]: neighbor capacity exceeded somewhere.
    """
    n = positions.shape[0]
    if n_i is None:
        n_i = n
    nbr_idx, nbr_cnt, overflow = frame_neighbor_table(
        positions, cell, species_idx, cutoff_matrix, max_neighbors, chunk,
        i_start=i_start, n_i=n_i,
    )
    inv_cell = jnp.linalg.inv(cell)
    k_cap = max_neighbors

    def chunk_hist(local_i0):
        idx = jax.lax.dynamic_slice(nbr_idx, (local_i0, 0), (chunk, k_cap))
        cnt = jax.lax.dynamic_slice(nbr_cnt, (local_i0,), (chunk,))
        g0 = i_start + local_i0
        si = jax.lax.dynamic_slice(species_idx, (g0,), (chunk,))
        pi = jax.lax.dynamic_slice(positions, (g0, 0), (chunk, 3))

        idx_safe = jnp.minimum(idx, n - 1)
        pj = positions[idx_safe]  # [chunk, K, 3]
        sj = species_idx[idx_safe]  # [chunk, K]
        slot_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (chunk, k_cap), 1) < cnt[:, None]
        )
        vec = min_image_delta(pj - pi[:, None, :], cell, inv_cell)
        norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1))
        unit = vec / jnp.maximum(norm, 1e-12)[..., None]
        # elementwise contraction over the 3 coords (full f32; see
        # pair_engine.matvec3 for why this is not an einsum/dot)
        cosang = jnp.sum(
            unit[:, :, None, :] * unit[:, None, :, :], axis=-1
        )
        theta = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
        tbin = jnp.minimum(
            jnp.floor(theta / dtheta).astype(jnp.int32), bins - 1
        )

        kk = jax.lax.broadcasted_iota(jnp.int32, (chunk, k_cap, k_cap), 1)
        ll = jax.lax.broadcasted_iota(jnp.int32, (chunk, k_cap, k_cap), 2)
        pair_valid = (
            (kk < ll)
            & slot_valid[:, :, None]
            & slot_valid[:, None, :]
        )

        out = jnp.zeros((len(specs), k_cap + 1, bins), jnp.float32)
        for s, (a, b) in enumerate(specs):
            center_ok = (si == a) if a >= 0 else (si >= 0)
            outer_ok = (sj == b) if b >= 0 else slot_valid
            outer_ok = outer_ok & slot_valid
            # coordination number: count of B-species neighbors of center
            cn_b = jnp.sum(outer_ok, axis=1).astype(jnp.int32)  # [chunk]
            mask = (
                pair_valid
                & center_ok[:, None, None]
                & outer_ok[:, :, None]
                & outer_ok[:, None, :]
            )
            key = jnp.where(mask, cn_b[:, None, None] * bins + tbin, (k_cap + 1) * bins)
            hist = jnp.zeros((k_cap + 1) * bins + 1, jnp.float32).at[
                key.reshape(-1)
            ].add(mask.reshape(-1).astype(jnp.float32))
            out = out.at[s].set(hist[:-1].reshape(k_cap + 1, bins))
        return out

    starts = jnp.arange(0, n_i, chunk)
    counts = jax.lax.map(chunk_hist, starts)
    return jnp.sum(counts, axis=0), overflow


def trajectory_bad_counts(
    positions,  # [F, N, 3]
    cells,  # [F, 3, 3]
    species_idx,
    cutoff_matrix,
    specs,
    dtheta,
    bins,
    max_neighbors=24,
    chunk=256,
):
    """Accumulate angle counts over all frames; returns (counts, overflow)."""

    def one(args):
        pos, cell = args
        return frame_bad_counts(
            pos, cell, species_idx, cutoff_matrix, specs, dtheta, bins,
            max_neighbors, chunk,
        )

    counts, overflow = jax.lax.map(one, (positions, cells))
    return jnp.sum(counts, axis=0), jnp.any(overflow)
