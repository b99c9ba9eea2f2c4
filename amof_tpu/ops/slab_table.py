"""
Two-level (x-slab, y-sorted) neighbor-table windows — the candidate
reduction for the BAD/CN table pass.

The 1-level sorted-window table (pair_engine.
frame_neighbor_payload_table_sorted) sorts atoms by fractional x alone;
each 256-center chunk then tests chunk + 2*window candidates (~3072 at
10k atoms, cutoff 2 A, 55 A box) although only ~60 atoms lie within the
cutoff of any center. Sorting by (x-slab, y) instead bounds candidates
in BOTH axes: a chunk of consecutive sorted centers lies in one slab
and spans a small y-range, so its true neighbors live in three
contiguous runs (slabs sx-1, sx, sx+1, each y-windowed) — ~3x fewer
candidate tests, which is the whole cost of the VMEM-bound Mosaic
compaction kernel (measured 8.3 ms/frame at bench shapes; see
scripts/profile_fused_stages.py).

Exactness contract (same spirit as the 1-level pass):
  * geometric (static): slab width >= max cutoff along the x
    perpendicular, and ry = max cutoff / y-perpendicular-width, so a
    neighbor differs by <= 1 slab and <= ry in fractional y. Computed
    conservatively over ALL frames in ``slab_plan`` (NPT-safe); no
    valid plan -> caller keeps the 1-level path.
  * per-frame (dynamic): every (chunk, run) candidate range must fit
    the static W (exact searchsorted count) and every slab's atom
    count must fit the static per-slab capacity — any violation raises
    the returned missed flag and the caller falls back.

Layout construction is sort-based (NO scatters — they serialize on
TPU): center slots are slab-aligned by keying synthetic filler rows
into each slab's deficit (computed with cumsum + searchsorted), and
the candidate array carries +-1 y-wrap images in a stride-3 key space
so every y-window query is one contiguous range.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from amof_tpu.ops.pair_engine import matvec3


class SlabPlan(NamedTuple):
    """Static plan for the 2-level table (hashable: jit static arg)."""
    nsx: int        # x-slab count
    cap: int        # center slots per slab (multiple of chunk)
    chunk: int      # centers per kernel step
    window: int     # candidate run capacity (multiple of 128)
    ry: float       # fractional-y neighbor reach (cutoff / w0y)
    yi: float       # y-image duplication width (>= ry)
    m_centers: int  # nsx * cap
    m_cand: int     # candidate array length (3 * n)
    n_atoms: int    # input row count the plan was built for


def slab_plan(cells, rc_max: float, n_atoms: int, chunk: int = 16,
              pad_limit: float = 1.6, positions=None,
              species_idx=None) -> Optional[SlabPlan]:
    """Build the static 2-level plan, or None when the geometry/count
    makes the 1-level window a better fit.

    ``cells`` may be [3, 3] or [F, 3, 3]; widths are minimized over
    frames so one plan serves an NPT trajectory.

    When ``positions`` ([F, N, 3] host array, optionally with
    ``species_idx`` [N] marking pad rows as -1) is given, the per-slab
    capacity is sized from the ACTUAL max slab population over frames
    instead of the uniform-density estimate — required whenever the
    density is structured along x (interfaces, crystals). Either way a
    frame that overflows the static capacity raises the dynamic
    ``missed`` flag and the caller falls back to the 1-level table.
    """
    cells = np.asarray(cells, np.float64)
    if cells.ndim == 2:
        cells = cells[None]
    widths = []
    for a in range(3):
        b, c = (a + 1) % 3, (a + 2) % 3
        cr = np.cross(cells[:, b], cells[:, c])
        v = np.abs(np.einsum("fi,fi->f", cells[:, a], cr))
        widths.append(float((v / np.linalg.norm(cr, axis=1)).min()))
    if rc_max <= 0:
        return None
    nsx = int(widths[0] / rc_max)
    if nsx < 3:
        return None
    ry = rc_max / widths[1] + 1e-6
    if 2.0 * ry >= 0.5:  # y reach comparable to the cell: no gain
        return None
    yi = float(np.ceil(ry / 1e-3) * 1e-3)
    pop = n_atoms / nsx
    if positions is not None:
        pos = np.asarray(positions, np.float32)
        if pos.ndim == 2:
            pos = pos[None]
        n_f = pos.shape[0]
        # cap the host pass at 64 evenly-spaced frames; unsampled
        # frames that clump harder flag `missed` and fall back
        sel = (np.linspace(0, n_f - 1, min(n_f, 64)).astype(int)
               if n_f > 64 else np.arange(n_f))
        inv = np.linalg.inv(cells.astype(np.float64))
        max_pop = 0
        n_real = pos.shape[1]
        if species_idx is not None:
            realm = np.asarray(species_idx) >= 0
            n_real = int(realm.sum())
        for f in sel:
            fx = pos[f] @ inv[f if inv.shape[0] == n_f else 0]
            fx = fx[:, 0] - np.floor(fx[:, 0])
            if species_idx is not None:
                fx = fx[realm]
            sl = np.minimum((fx * nsx).astype(np.int64), nsx - 1)
            max_pop = max(max_pop, int(np.bincount(
                sl, minlength=nsx
            ).max()))
        n_pads = n_atoms - n_real
        cap = (max_pop + n_pads / nsx
               + 3.0 * np.sqrt(max(max_pop, 1.0)) + 8)
        pop = max(pop, float(max_pop))  # window sizing sees the clump
    else:
        cap = pop + 5.0 * np.sqrt(max(pop, 1.0)) + 16
    cap = int(-(-cap // chunk) * chunk)
    m_centers = nsx * cap
    if m_centers < n_atoms:
        cap += int(-(-(n_atoms - m_centers) // (nsx * chunk)) * chunk)
        m_centers = nsx * cap
    if m_centers > pad_limit * n_atoms:
        return None
    # run capacity: chunk's own span + 2*ry reach, images add <= 2*yi
    mean_r = (chunk + 2.0 * ry * pop) * (1.0 + 2.0 * yi)
    w_est = mean_r + 6.0 * np.sqrt(max(mean_r, 1.0)) + 16
    window = int(-(-(w_est + 127) // 128) * 128)
    m_cand = int(-(-(3 * n_atoms) // 128) * 128)
    if 3 * window >= m_cand or window >= n_atoms:
        return None
    return SlabPlan(nsx, cap, chunk, window, float(ry), yi,
                    m_centers, m_cand, n_atoms)


def _pad_spread(real):
    """Synthetic (fx, fy) for pad rows: spread uniformly BY PAD RANK so
    sizing sees them diluted. Keying off the global row index instead
    clusters them (pads sit in contiguous runs between species blocks,
    so consecutive indices map to one slab — measured 624 atoms in a
    528-cap slab at bench shapes)."""
    rank = jnp.cumsum((~real).astype(jnp.float32)) - 1.0
    n_pads = jnp.maximum(jnp.sum((~real).astype(jnp.float32)), 1.0)
    fx = (rank + 0.5) / n_pads
    fy = (rank * 0.6180339887) % 1.0
    return fx, fy


def build_slab_layout(positions, species_idx, cell, plan: SlabPlan):
    """Per-frame (traced) construction of the 2-level layout.

    Returns:
      centers  f32[M, 8]  columns (x, y, z, sp, gidx, fy, 0, 0) in
               slab-aligned slot order (sp == -1 marks filler slots)
      cand     f32[8, M2] rows (x, y, z, sp, gidx, key, 0, 0) sorted by
               the stride-3 y-image key
      starts   i32[n_chunks, 3]   128-aligned run starts
      qbounds  f32[n_chunks, 3, 2] key-range [lo, hi) per run
      missed   bool[]  capacity/coverage violation (results incomplete)
    """
    n = positions.shape[0]
    nsx, cap, chunk = plan.nsx, plan.cap, plan.chunk
    w = plan.window
    m = plan.m_centers
    m2 = plan.m_cand
    inv_cell = jnp.linalg.inv(cell)
    frac = matvec3(positions, inv_cell)
    fx = frac[:, 0] - jnp.floor(frac[:, 0])
    fy = frac[:, 1] - jnp.floor(frac[:, 1])
    real = species_idx >= 0
    sfx, sfy = _pad_spread(real)
    fx = jnp.where(real, fx, sfx)
    fy = jnp.where(real, fy, sfy)
    slab = jnp.minimum((fx * nsx).astype(jnp.int32), nsx - 1)
    gidx = jnp.arange(n, dtype=jnp.float32)
    sp_f = species_idx.astype(jnp.float32)

    # ---- slab populations + filler placement (sort-based, no scatter)
    oh = (
        slab[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, nsx), 1)
    ).astype(jnp.float32)  # counts ALL input rows (pads occupy slots)
    pop = jnp.sum(oh, axis=0).astype(jnp.int32)  # [nsx]
    missed = jnp.any(pop > cap)
    deficit = jnp.maximum(cap - pop, 0)
    cum_def = jnp.cumsum(deficit)
    n_extra = m - n
    t = jnp.arange(n_extra, dtype=jnp.int32)
    extra_slab = jnp.searchsorted(cum_def, t, side="right").astype(
        jnp.int32
    )
    extra_slab = jnp.minimum(extra_slab, nsx - 1)

    # ---- centers: key = slab*2 + fy (reals), slab*2 + 1 + eps (pads)
    key_real = slab.astype(jnp.float32) * 2.0 + jnp.where(
        real, fy, 1.0 + sfy * 0.5
    )
    key_extra = extra_slab.astype(jnp.float32) * 2.0 + 1.5 + 0.5 * (
        t.astype(jnp.float32) + 0.5
    ) / jnp.float32(max(n_extra, 1))
    zeros_e = jnp.zeros(n_extra, jnp.float32)
    keys_c = jnp.concatenate([key_real, key_extra])
    ch = lambda a: jnp.concatenate([a, zeros_e])
    neg_e = jnp.full(n_extra, -1.0, jnp.float32)
    sorted_c = jax.lax.sort(
        (
            keys_c,
            ch(positions[:, 0]), ch(positions[:, 1]), ch(positions[:, 2]),
            jnp.concatenate([sp_f, neg_e]),
            jnp.concatenate([gidx, neg_e]),
            ch(fy),
        ),
        dimension=0, num_keys=1,
    )
    zeros_m = jnp.zeros(m, jnp.float32)
    centers = jnp.stack(
        list(sorted_c[1:]) + [zeros_m, zeros_m], axis=1
    )  # [M, 8]: x y z sp gidx fy 0 0
    sp_sorted = sorted_c[4]
    fy_sorted = sorted_c[6]

    # ---- candidates: stride-3 keys with +-1 y-wrap images (reals only)
    yi = plan.yi
    key_main = jnp.where(
        real, slab.astype(jnp.float32) * 3.0 + 1.0 + fy, 3e9
    )
    key_lo = jnp.where(
        real & (fy > 1.0 - yi), slab.astype(jnp.float32) * 3.0 + fy, 3e9
    )
    key_hi = jnp.where(
        real & (fy < yi), slab.astype(jnp.float32) * 3.0 + 2.0 + fy, 3e9
    )
    pad_b = m2 - 3 * n  # 128-alignment tail (plan.m_cand)
    pb = jnp.full(pad_b, 5e9, jnp.float32)
    pz = jnp.zeros(pad_b, jnp.float32)
    keys_b = jnp.concatenate([key_main, key_lo, key_hi, pb])
    c3 = lambda a: jnp.concatenate([a, a, a, pz])
    sorted_b = jax.lax.sort(
        (
            keys_b,
            c3(positions[:, 0]), c3(positions[:, 1]), c3(positions[:, 2]),
            jnp.concatenate([sp_f, sp_f, sp_f,
                             jnp.full(pad_b, -1.0, jnp.float32)]),
            jnp.concatenate([gidx, gidx, gidx,
                             jnp.full(pad_b, -1.0, jnp.float32)]),
        ),
        dimension=0, num_keys=1,
    )
    kb = sorted_b[0]
    cand = jnp.stack(
        list(sorted_b[1:]) + [sorted_b[0], jnp.zeros(m2, jnp.float32),
                              jnp.zeros(m2, jnp.float32)],
        axis=0,
    )  # rows: x y z sp gidx key 0 0

    # ---- per-chunk run ranges
    n_chunks = m // chunk
    fy_lo = jnp.where(sp_sorted >= 0, fy_sorted, jnp.inf).reshape(
        n_chunks, chunk
    ).min(axis=1)
    fy_hi = jnp.where(sp_sorted >= 0, fy_sorted, -jnp.inf).reshape(
        n_chunks, chunk
    ).max(axis=1)
    sx = jnp.arange(n_chunks, dtype=jnp.int32) // (cap // chunk)
    ry = plan.ry
    qlo_y = fy_lo - ry
    qhi_y = fy_hi + ry
    offs = jnp.array([-1, 0, 1], jnp.int32)
    slab_r = (sx[:, None] + offs[None, :]) % nsx  # [C, 3]
    base = slab_r.astype(jnp.float32) * 3.0 + 1.0
    klo = base + qlo_y[:, None]
    khi = base + qhi_y[:, None]
    empty = ~jnp.isfinite(qlo_y)
    klo = jnp.where(empty[:, None], 4e9, klo)
    khi = jnp.where(empty[:, None], 4e9, khi)
    st = jnp.searchsorted(kb, klo.reshape(-1)).astype(jnp.int32)
    en = jnp.searchsorted(kb, khi.reshape(-1)).astype(jnp.int32)
    st_al = jnp.bitwise_and(st, jnp.int32(~127))
    missed = missed | jnp.any(en - st_al > w)
    st_al = jnp.clip(st_al, 0, m2 - w).reshape(n_chunks, 3)
    qbounds = jnp.stack(
        [klo.reshape(n_chunks, 3), khi.reshape(n_chunks, 3)], axis=-1
    )
    return centers, cand, st_al, qbounds, missed


def frame_neighbor_payload_table_slab(
    positions,  # [N, 3] (padded rows have species -1)
    cell,
    species_idx,  # [N]
    cutoff_matrix,  # [S, S]
    max_neighbors: int,
    plan: SlabPlan,
    emit_cn: bool = False,
    interpret: bool = False,
):
    """2-level drop-in for the 1-level sorted table (same outputs as
    pair_engine.frame_neighbor_payload_table_sorted, full i-range):
    (nbr_pos [M, K, 3], nbr_sp [M, K], nbr_cnt [M], flag, center_pos
    [M, 3], center_sp [M] [, cn [S, S]]) with M = plan.m_centers
    center slots (fillers carry species -1 and empty tables — the
    angle/histogram consumers mask them exactly like pad atoms).
    Neighbor SETS match the full table; slot order is run-major."""
    from amof_tpu.ops.pallas_neighbors import pallas_window_table_slab

    assert positions.shape[0] == plan.n_atoms, (
        positions.shape, plan.n_atoms
    )
    n_species = cutoff_matrix.shape[0]
    centers, cand, starts, qbounds, missed = build_slab_layout(
        positions, species_idx, cell, plan
    )
    nbr_pos, nbr_sp, cnt = pallas_window_table_slab(
        centers, cand, starts, qbounds, cell, cutoff_matrix,
        n_species, max_neighbors, plan.chunk, plan.window,
        interpret=interpret,
    )
    center_pos = centers[:, 0:3]
    center_sp = centers[:, 3].astype(jnp.int32)
    flag = missed | jnp.any(cnt > max_neighbors)
    out = (
        nbr_pos, nbr_sp, jnp.minimum(cnt, max_neighbors), flag,
        center_pos, center_sp,
    )
    if emit_cn:
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, n_species), 1)
        oh_n = (
            (jnp.maximum(nbr_sp, 0)[..., None] == iota_s[None])
            & (nbr_sp[..., None] >= 0)
        ).astype(jnp.float32)  # [M, K, S]
        per_i = jnp.sum(oh_n, axis=1)  # [M, S_j]
        oh_i = (center_sp[:, None] == iota_s).astype(jnp.float32)
        cn = jax.lax.dot_general(
            oh_i, per_i,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = out + (cn,)
    return out
