"""
Pallas TPU kernel: sorted-window neighbor-table compaction.

The K-slot payload compaction of
``pair_engine.frame_neighbor_payload_table_sorted`` makes ~7 masked
passes over a [chunk, chunk + 2W] workspace per slot; XLA materializes
intermediates between passes, so the XLA version is bandwidth-bound.
This kernel runs the whole compaction VMEM-resident: one grid step per
center chunk slices its window from the full sorted/extended payload
array (resident in VMEM), computes minimum-image distances and
per-species cutoff validity, and emits the K nearest-by-sorted-index
neighbors' payloads packed into a [chunk, 128] lane block.

Layouts mirror pallas_rdf: centers ride a [n, 8] row-major array
(block-sliced per grid step), the window candidates a transposed
[8, n + 2W] copy (lane-major, dynamic lane slice at chunk granularity).
Scalar prefetch carries cell matrices + the squared cutoff matrix.

The exactness contract is unchanged: the caller's full-range
verification pass (XLA) recomputes every center's true neighbor count
and flags any window miss; this kernel additionally returns its own
window count for that comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WRAP_EPS = 1e-7


def _kernel(scalars, centers_ref, ext_j_ref, out_ref, *, n_species, k_cap,
            chunk, width, window):
    i_t = pl.program_id(0)
    c0 = i_t * chunk

    xi = centers_ref[:, 0:3]  # [C, 3]
    si = centers_ref[:, 3:4]  # [C, 1] species as float (-1 pads)
    wj = ext_j_ref[:, pl.ds(c0, width)]  # [8, width]
    xj = wj[0:3, :]
    sj = wj[3:4, :]

    dx = xj[0:1, :] - xi[:, 0:1]
    dy = xj[1:2, :] - xi[:, 1:2]
    dz = xj[2:3, :] - xi[:, 2:3]
    inv = [scalars[k] for k in range(9)]
    cel = [scalars[9 + k] for k in range(9)]
    fx = dx * inv[0] + dy * inv[3] + dz * inv[6]
    fy = dx * inv[1] + dy * inv[4] + dz * inv[7]
    fz = dx * inv[2] + dy * inv[5] + dz * inv[8]
    fx = fx - jnp.floor(fx + (0.5 + WRAP_EPS))
    fy = fy - jnp.floor(fy + (0.5 + WRAP_EPS))
    fz = fz - jnp.floor(fz + (0.5 + WRAP_EPS))
    wx = fx * cel[0] + fy * cel[3] + fz * cel[6]
    wy = fx * cel[1] + fy * cel[4] + fz * cel[7]
    wz = fx * cel[2] + fy * cel[5] + fz * cel[8]
    d2 = wx * wx + wy * wy + wz * wz  # [C, width]

    # per-species cutoff: thr(a)[j] = cut2[a, s_j], rows masked by s_i
    sii = si.astype(jnp.int32)
    sjj = sj.astype(jnp.int32)
    valid = jnp.zeros(d2.shape, jnp.bool_)
    for a in range(n_species):
        thr = jnp.zeros((1, width), jnp.float32)
        for b in range(n_species):
            thr += jnp.where(
                sjj == b, scalars[18 + a * n_species + b], 0.0
            )
        valid |= (sii == a) & (d2 < thr)

    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, width), 1)
    self_col = window + jax.lax.broadcasted_iota(
        jnp.int32, (chunk, width), 0
    )
    valid &= col != self_col
    cnt = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.float32)

    score = jnp.where(valid, col, width)
    cols = [cnt]
    for _ in range(k_cap):
        picked = jnp.min(score, axis=1, keepdims=True)  # [C, 1]
        sel = (score == picked) & (picked < width)
        f = sel.astype(jnp.float32)
        x = jnp.sum(f * xj[0:1, :], axis=1, keepdims=True)
        y = jnp.sum(f * xj[1:2, :], axis=1, keepdims=True)
        z = jnp.sum(f * xj[2:3, :], axis=1, keepdims=True)
        s = jnp.where(
            picked < width,
            jnp.sum(f * sj, axis=1, keepdims=True),
            -1.0,
        )
        cols += [x, y, z, s]
        score = jnp.where(sel, width, score)
    pad_lanes = out_ref.shape[1] - 1 - 4 * k_cap
    cols.append(jnp.zeros((chunk, pad_lanes), jnp.float32))
    out_ref[:] = jnp.concatenate(cols, axis=1)  # [C, 128]


@functools.partial(
    jax.jit,
    static_argnames=("n_species", "max_neighbors", "chunk", "window",
                     "interpret"),
)
def pallas_window_table(
    pos_sorted,  # f32[n, 3] sorted by wrapped fractional x
    sp_sorted,  # i32[n] (-1 pads, sorted last)
    cell,
    cutoff_matrix,  # f32[S, S]
    n_species: int,
    max_neighbors: int,
    chunk: int,
    window: int,  # multiple of 128; window slices start at chunk grain
    interpret: bool = False,
):
    """VMEM-resident K-slot compaction over sorted windows (full i-range;
    atom-sharded paths keep the XLA loop).

    Returns (nbr_pos f32[n, K, 3], nbr_sp i32[n, K], cnt_win i32[n]) —
    same neighbor sets as the XLA loop in
    frame_neighbor_payload_table_sorted (slot order is ascending sorted
    index in both).
    """
    n = pos_sorted.shape[0]
    n_i = n
    k_cap = max_neighbors
    assert chunk + 2 * window < n
    assert 1 + 4 * k_cap <= 128, "packed payload must fit one lane block"
    sp_f = sp_sorted.astype(jnp.float32)
    atoms = jnp.concatenate(
        [pos_sorted, sp_f[:, None], jnp.zeros((n, 4), jnp.float32)], axis=1
    )  # [n, 8]
    ext = jnp.concatenate(
        [atoms[n - window:], atoms, atoms[:window]], axis=0
    )
    ext_j = ext.T.reshape(8, n + 2 * window)
    centers = atoms

    inv_cell = jnp.linalg.inv(cell)
    scalars = jnp.concatenate(
        [inv_cell.reshape(-1), cell.reshape(-1),
         (cutoff_matrix * cutoff_matrix).reshape(-1)]
    ).astype(jnp.float32)

    width = chunk + 2 * window
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_i // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 8), lambda i, s: (i, 0)),
            pl.BlockSpec((8, n + 2 * window), lambda i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk, 128), lambda i, s: (i, 0)),
    )
    kernel = functools.partial(
        _kernel, n_species=n_species, k_cap=k_cap, chunk=chunk,
        width=width, window=window,
    )
    packed = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_i, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, centers, ext_j)

    cnt_win = packed[:, 0].astype(jnp.int32)
    pay = packed[:, 1:1 + 4 * k_cap].reshape(n_i, k_cap, 4)
    nbr_pos = pay[:, :, 0:3]
    nbr_sp = pay[:, :, 3].astype(jnp.int32)
    return nbr_pos, nbr_sp, cnt_win
