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


# --------------------------------------------------------------------------
# Two-level (x-slab, y-window) variant: per-chunk dynamic candidate runs
# --------------------------------------------------------------------------


def _kernel_slab(scalars, starts, qb, centers_ref, *cand_out, n_species,
                 k_cap, chunk, w, n_blk):
    """K-slot compaction over three dynamically-placed candidate runs.

    ``starts`` (scalar prefetch) carries per-(chunk, run) 128-aligned
    block offsets consumed by the candidate BlockSpec index maps; the
    kernel itself re-reads nothing dynamic — it sees 3 * n_blk lane
    blocks already DMAed, applies the per-run key-range masks from
    ``qb`` (exactness: the 128-alignment slack and any unrelated rows
    inside a run are masked off), and compacts exactly like
    ``_kernel``. Self-pairs are excluded by global index (row 4), not
    column position — centers and candidates come from different sort
    orders."""
    i_t = pl.program_id(0)
    cand_refs = cand_out[:-1]
    out_ref = cand_out[-1]

    xi = centers_ref[:, 0:3]  # [C, 3]
    si = centers_ref[:, 3:4]  # [C, 1]
    gi = centers_ref[:, 4:5]  # [C, 1] global index (-1 fillers)

    wj = jnp.concatenate([r[:] for r in cand_refs], axis=1)  # [8, 3W]
    xj = wj[0:3, :]
    sj = wj[3:4, :]
    gj = wj[4:5, :]
    kj = wj[5:6, :]

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
    d2 = wx * wx + wy * wy + wz * wz  # [C, 3W]

    sii = si.astype(jnp.int32)
    sjj = sj.astype(jnp.int32)
    valid = jnp.zeros(d2.shape, jnp.bool_)
    for a in range(n_species):
        thr = jnp.zeros((1, 3 * w), jnp.float32)
        for b in range(n_species):
            thr += jnp.where(
                sjj == b, scalars[18 + a * n_species + b], 0.0
            )
        valid |= (sii == a) & (d2 < thr)

    # per-run key-range masks (one contiguous [qlo, qhi) per run)
    masks = []
    for r in range(3):
        qlo = qb[i_t * 6 + 2 * r]
        qhi = qb[i_t * 6 + 2 * r + 1]
        kr = kj[:, r * w:(r + 1) * w]
        masks.append((kr >= qlo) & (kr < qhi))
    valid &= jnp.concatenate(masks, axis=1)
    valid &= gj != gi  # self-exclusion (and filler centers: gi == -1
    #                    never matches real gj... fillers are killed by
    #                    the species row below anyway)
    valid &= si >= 0
    cnt = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, 3 * w), 1)
    score = jnp.where(valid, col, 3 * w)
    cols = [cnt]
    for _ in range(k_cap):
        picked = jnp.min(score, axis=1, keepdims=True)
        sel = (score == picked) & (picked < 3 * w)
        f = sel.astype(jnp.float32)
        x = jnp.sum(f * xj[0:1, :], axis=1, keepdims=True)
        y = jnp.sum(f * xj[1:2, :], axis=1, keepdims=True)
        z = jnp.sum(f * xj[2:3, :], axis=1, keepdims=True)
        s = jnp.where(
            picked < 3 * w,
            jnp.sum(f * sj, axis=1, keepdims=True),
            -1.0,
        )
        cols += [x, y, z, s]
        score = jnp.where(sel, 3 * w, score)
    pad_lanes = out_ref.shape[1] - 1 - 4 * k_cap
    cols.append(jnp.zeros((chunk, pad_lanes), jnp.float32))
    out_ref[:] = jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("n_species", "max_neighbors", "chunk", "window",
                     "interpret"),
)
def pallas_window_table_slab(
    centers,  # f32[M, 8] slab-aligned (x, y, z, sp, gidx, fy, 0, 0)
    cand,  # f32[8, M2] stride-3-keyed (x, y, z, sp, gidx, key, 0, 0)
    starts,  # i32[n_chunks, 3] 128-aligned run starts (element units)
    qbounds,  # f32[n_chunks, 3, 2] key ranges
    cell,
    cutoff_matrix,
    n_species: int,
    max_neighbors: int,
    chunk: int,
    window: int,
    interpret: bool = False,
):
    """VMEM-resident compaction over 2-level (slab, y) windows.

    Inputs come from ``slab_table.build_slab_layout``; neighbor SETS
    per center equal the full table's (slot ORDER is run-major — the
    histogram consumers are order-invariant; set-compare in tests).

    Returns (nbr_pos f32[M, K, 3], nbr_sp i32[M, K], cnt i32[M]).
    """
    m = centers.shape[0]
    k_cap = max_neighbors
    assert window % 128 == 0
    assert 1 + 4 * k_cap <= 128
    n_blk = window // 128
    n_chunks = m // chunk
    starts_blk = (starts // 128).reshape(-1)  # [n_chunks * 3]
    qb = qbounds.reshape(-1)  # [n_chunks * 6]

    inv_cell = jnp.linalg.inv(cell)
    scalars = jnp.concatenate(
        [inv_cell.reshape(-1), cell.reshape(-1),
         (cutoff_matrix * cutoff_matrix).reshape(-1)]
    ).astype(jnp.float32)

    cand_specs = [
        pl.BlockSpec(
            (8, 128),
            functools.partial(
                lambda i, sc, st, qb, r, b: (0, st[i * 3 + r] + b),
                r=r, b=b,
            ),
        )
        for r in range(3)
        for b in range(n_blk)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, 8), lambda i, sc, st, qb: (i, 0)),
        ] + [cand_specs[j] for j in range(3 * n_blk)],
        out_specs=pl.BlockSpec((chunk, 128), lambda i, sc, st, qb: (i, 0)),
    )
    kernel = functools.partial(
        _kernel_slab, n_species=n_species, k_cap=k_cap, chunk=chunk,
        w=window, n_blk=n_blk,
    )
    packed = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, starts_blk, qb, centers, *([cand] * (3 * n_blk)))

    cnt = packed[:, 0].astype(jnp.int32)
    pay = packed[:, 1:1 + 4 * k_cap].reshape(m, k_cap, 4)
    return pay[:, :, 0:3], pay[:, :, 3].astype(jnp.int32), cnt
