"""Mosaic (Pallas) engine for the pore surface-sampling blocker pass.

Behavior parity: Zeo++'s ASA construction (amof/pore/pysimmzeopp.py:119-128
in the reference): for each atom i, K points on the sphere of radius
R_i + r_probe; a point counts iff it lies outside every OTHER atom's
inflated sphere. This module computes the same per-point validity (and
the voxel indices consumed by ``classify_surface_points``) as
``grid_kernel.surface_valid_columns``, but runs the compare-accumulate
loop in a Pallas TPU kernel instead of a lax.map of XLA window ops.

Why: the XLA pass measures ~26G pair-tests/s on v5e (~8% of the VPU f32
peak) — bound by materialized [P, window] intermediates and per-step
dispatch of the batched lax.map, not by compute. The kernel keeps the
EXACT production candidate windows (3 y-duplicated column runs per
chunk) and accumulates in vregs. Two Mosaic constraints shape it:

 - dynamic lane slices must be 128-aligned on this target
   ("cannot statically prove that index ... is a multiple of 128"),
   so window starts are aligned DOWN to 128 and the static width is
   extended by one segment (~+17% candidates — still ~5x net);
 - atom chunks are 128 rows so the centers block can be selected by a
   scalar-prefetch-dependent BlockSpec index map (no in-kernel
   transpose, no XLA gather).

Extra tested rows are harmless by construction: every candidate row is
unwrapped to a true minimum-image atom position (round-based, exactly
as the XLA path), so alien rows from neighboring columns can only
reject points that genuinely lie inside a blocker sphere. Dead pad
rows (radius -10, gid -1) are explicitly neutralized with a NEGATIVE
threshold: their squared threshold would be large positive and the
unwrap collapses their 1e6 coordinates into the cell, so without the
radius<0 guard they acted as phantom blockers whenever a window
overran the real rows (reachable on small systems whose table tail
sits within one padded window of the last column).

The public entry ``surface_valid_columns_pallas`` mirrors
``surface_valid_columns``'s contract: (valid[S, K], idx_pt, idx_nudge,
orig_idx[S], radii[S], missed). Slot partitioning differs (128-atom
chunks vs 64), so raw ``valid`` arrays are not comparable slot-by-slot
with the XLA path on skipped chunks; ``classify_surface_points``
outputs are identical (non-candidate points land on code-0 voxels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amof_tpu.ops.pair_engine import matvec3

SEG = 128
CHUNK = 128  # atoms per kernel slot (lane-alignment of the centers block)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def pallas_surface_dims(window: int, col_cap: int) -> dict:
    """Static kernel dims from the surface plan's window/col_cap."""
    n_z = -(-(col_cap + CHUNK - 1) // CHUNK)  # coverage >= col_cap
    w_pad = (-(-window // SEG) + 1) * SEG  # aligned-start extension
    return {"n_z": n_z, "w_pad": w_pad, "n_seg": w_pad // SEG}


def _make_kernel(k_dirs: int, n_seg: int, dirs: np.ndarray,
                 r_probe: float, grid: tuple):
    """Build the kernel body with static dirs/probe/grid baked in."""
    dxs = [float(dirs[k, 0]) for k in range(k_dirs)]
    dys = [float(dirs[k, 1]) for k in range(k_dirs)]
    dzs = [float(dirs[k, 2]) for k in range(k_dirs)]
    peps = np.float32(r_probe - 1e-4)
    rp = np.float32(r_probe)
    gx, gy, gz = (np.float32(g) for g in grid)
    gxi, gyi, gzi = (np.int32(g - 1) for g in grid)
    g1, g2 = np.int32(grid[1]), np.int32(grid[2])

    def lin_idx(fx, fy, fz):
        """Voxel linear index; ops mirror grid_kernel's linear_idx."""
        fx = fx - jnp.floor(fx)
        fy = fy - jnp.floor(fy)
        fz = fz - jnp.floor(fz)
        ix = jnp.minimum((fx * gx).astype(jnp.int32), gxi)
        iy = jnp.minimum((fy * gy).astype(jnp.int32), gyi)
        iz = jnp.minimum((fz * gz).astype(jnp.int32), gzi)
        return (ix * g1 + iy) * g2 + iz

    def kern(r0b_ref, st3_ref, has_ref, ucx_ref, ucy_ref, cell_ref,
             icell_ref, nf_ref, ct_ref, tab_ref,
             valid_ref, ipt_ref, inu_ref, gis_ref, rs_ref):
        i = pl.program_id(0)
        fx = ct_ref[:, 0:1]
        fy = ct_ref[:, 1:2]
        fz = ct_ref[:, 2:3]
        ra = ct_ref[:, 3:4]
        cg = ct_ref[:, 4:5]
        gis_ref[0] = cg
        rs_ref[0] = ra
        c = [cell_ref[j] for j in range(9)]
        ic = [icell_ref[j] for j in range(9)]

        # centers are their own column's atoms: the XLA path's unwrap
        # term round(fa - uc) is exactly 0 there, so centers_cart is
        # bit-identical to matvec3(fa_u, cell)
        ccx = fx * c[0] + fy * c[3] + fz * c[6]
        ccy = fx * c[1] + fy * c[4] + fz * c[7]
        ccz = fx * c[2] + fy * c[5] + fz * c[8]

        def skip(_):
            valid_ref[0] = jnp.zeros(valid_ref.shape[1:], jnp.bool_)
            ipt_ref[0] = jnp.zeros(ipt_ref.shape[1:], jnp.int32)
            inu_ref[0] = jnp.zeros(inu_ref.shape[1:], jnp.int32)

        @pl.when(has_ref[i] == 0)
        def _():
            skip(None)

        @pl.when(has_ref[i] != 0)
        def _():
            pxs, pys, pzs, fpzs = [], [], [], []
            for k in range(k_dirs):
                rx = ra + rp
                px = ccx + rx * dxs[k]
                py = ccy + rx * dys[k]
                pz = ccz + rx * dzs[k]
                fpx = px * ic[0] + py * ic[3] + pz * ic[6]
                fpy = px * ic[1] + py * ic[4] + pz * ic[7]
                fpz = px * ic[2] + py * ic[5] + pz * ic[8]
                pxs.append(px)
                pys.append(py)
                pzs.append(pz)
                fpzs.append(fpz)
                ipt_ref[0, :, k:k + 1] = lin_idx(fpx, fpy, fpz)
                nfx = nf_ref[3 * k]
                nfy = nf_ref[3 * k + 1]
                nfz = nf_ref[3 * k + 2]
                inu_ref[0, :, k:k + 1] = lin_idx(
                    fpx + nfx, fpy + nfy, fpz + nfz
                )

            cx = ucx_ref[i]
            cy = ucy_ref[i]
            acc = [jnp.ones((CHUNK, 1), jnp.bool_)
                   for _ in range(k_dirs)]
            for s in range(3):
                st0 = pl.multiple_of(st3_ref[i, s], SEG)
                for q in range(n_seg):
                    sl = pl.ds(st0 + q * SEG, SEG)
                    wxf = tab_ref[pl.ds(0, 1), sl]
                    wyf = tab_ref[pl.ds(1, 1), sl]
                    wzf = tab_ref[pl.ds(2, 1), sl]
                    wr = tab_ref[pl.ds(3, 1), sl]
                    wg = tab_ref[pl.ds(4, 1), sl]
                    wx = wxf - jnp.round(wxf - cx)
                    wy = wyf - jnp.round(wyf - cy)
                    wcx = wx * c[0] + wy * c[3] + wzf * c[6]
                    wcy = wx * c[1] + wy * c[4] + wzf * c[7]
                    wcz = wx * c[2] + wy * c[5] + wzf * c[8]
                    thr = (wr + peps) ** 2
                    # dead pad rows (radius -10) MUST be inert: the
                    # squared threshold is large POSITIVE for them and
                    # the xy unwrap collapses their 1e6 coordinates
                    # into the cell (round(1e6 - cx) cancels at f32),
                    # creating phantom blockers whenever a window
                    # overruns the real rows — force thr negative for
                    # any negative-radius row (self-exclusion too)
                    te = jnp.where(
                        (wg == cg) | (wr < 0), jnp.float32(-1.0), thr
                    )
                    for k in range(k_dirs):
                        zs = jnp.round(fpzs[k] - wzf)
                        dx = pxs[k] - wcx - zs * c[6]
                        dy = pys[k] - wcy - zs * c[7]
                        dz = pzs[k] - wcz - zs * c[8]
                        d2 = dx * dx + dy * dy + dz * dz
                        acc[k] = acc[k] & jnp.all(
                            d2 > te, axis=1, keepdims=True
                        )
            for k in range(k_dirs):
                valid_ref[0, :, k:k + 1] = acc[k]

    return kern


def surface_valid_columns_pallas(
    frac_atoms,  # f32[N, 3], no padding rows
    cell,
    radii,  # f32[N]
    r_probe,
    dirs,  # f32[K, 3] unit vectors — CONCRETE (baked into the kernel)
    grid,
    nbx: int,
    nby: int,
    window: int,
    col_cap: int,
    cand_mask=None,
    interpret: bool | None = None,
):
    """Pallas twin of ``grid_kernel.surface_valid_columns``.

    Same candidate construction (coarse xy columns, candidate-first
    center sort, y-duplicated blocker runs, exact prefilter), same
    returned tuple; the blocker pass runs as a Mosaic kernel. Slot
    layout is 128-atom chunks, so S differs from the XLA path.

    NOT jitted at this level: ``dirs`` must be CONCRETE (its values
    are baked into the kernel as immediates). Call it inside an outer
    jit (as BatchedPore's frame functions do) with dirs closed over.
    """
    from amof_tpu.pore import grid_kernel

    if interpret is None:
        interpret = _interpret()
    dirs_np = np.asarray(dirs, np.float32)
    k_dirs = dirs_np.shape[0]
    n = frac_atoms.shape[0]
    dims = pallas_surface_dims(window, col_cap)
    n_z, w_pad, n_seg = dims["n_z"], dims["w_pad"], dims["n_seg"]
    inv_cell = jnp.linalg.inv(cell)
    n_cols = nbx * nby
    stride = nby + 2
    n_slots = n_cols * n_z

    fx = frac_atoms[:, 0] - jnp.floor(frac_atoms[:, 0])
    fy = frac_atoms[:, 1] - jnp.floor(frac_atoms[:, 1])
    fz = frac_atoms[:, 2] - jnp.floor(frac_atoms[:, 2])
    bx = jnp.minimum((fx * nbx).astype(jnp.int32), nbx - 1)
    by = jnp.minimum((fy * nby).astype(jnp.int32), nby - 1)
    gidx = jnp.arange(n, dtype=jnp.float32)

    cand = grid_kernel.surface_candidate_mask(
        frac_atoms, inv_cell, radii, r_probe, dirs, grid, cand_mask
    )

    # centers: candidate-first, z-sorted column sort (as the XLA path),
    # plus dead pad rows to a CHUNK multiple (sorted to the tail)
    key_c = (bx * nby + by).astype(jnp.float32) + jnp.where(
        cand, fz * 0.5, 0.5 + fz * 0.5
    )
    n8 = -(-(n + 1) // CHUNK) * CHUNK
    pad_n = n8 - n

    def padded(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad_n,), fill, a.dtype)]
        )

    keys_c, cx_s, cy_s, cz_s, cr_s, cg_s, cc_s = jax.lax.sort(
        (
            padded(key_c, 4e9), padded(fx, 0.5), padded(fy, 0.5),
            padded(fz, 2.0), padded(radii, -10.0), padded(gidx, -1.0),
            padded(cand.astype(jnp.float32), 0.0),
        ),
        dimension=0, num_keys=1,
    )
    c_bounds = jnp.searchsorted(
        keys_c, jnp.arange(n_cols + 1, dtype=jnp.float32)
    ).astype(jnp.int32)
    c_counts = c_bounds[1:] - c_bounds[:-1]
    missed = jnp.any(c_counts > col_cap)
    cand_end = jnp.searchsorted(
        keys_c, jnp.arange(n_cols, dtype=jnp.float32) + 0.5
    ).astype(jnp.int32)

    # blockers: y-edge-duplicated column sort + dead pad to Mpad
    keys_b, blockers_pl = grid_kernel._sort_atoms_xycols(
        frac_atoms, [radii, gidx], nbx, nby
    )
    m_rows = keys_b.shape[0]
    m_pad = -(-(m_rows + w_pad) // SEG) * SEG
    pad_m = m_pad - m_rows
    dead = jnp.tile(
        jnp.array([[1e6], [1e6], [1e6], [-10.0], [-1.0]], jnp.float32),
        (1, pad_m),
    )
    tab = jnp.concatenate([blockers_pl, dead], axis=1)
    cstarts_b = jnp.searchsorted(
        keys_b, jnp.arange(nbx * stride + 1, dtype=jnp.float32)
    ).astype(jnp.int32)

    # per-slot scalars (band-major: z-chunk index minor, as XLA path)
    cc = jnp.arange(n_slots, dtype=jnp.int32) % n_cols
    zi = jnp.arange(n_slots, dtype=jnp.int32) // n_cols
    cb = c_bounds[cc]
    nat = (cb // CHUNK) * CHUNK + zi * CHUNK
    r0 = jnp.minimum(nat, n8 - CHUNK)
    has = (r0 < cand_end[cc]) & (r0 + CHUNK > cb)

    cbx, cby = cc // nby, cc % nby
    b0 = (
        ((cbx[:, None] + jnp.array([-1, 0, 1])[None, :]) % nbx) * stride
        + cby[:, None]
    )
    st = cstarts_b[b0.reshape(-1)].reshape(-1, 3)
    en = cstarts_b[(b0 + 3).reshape(-1)].reshape(-1, 3)
    missed = missed | jnp.any((en - st) > window)
    st3 = jnp.minimum((st // SEG) * SEG, m_pad - w_pad)
    ucx = (cbx.astype(jnp.float32) + 0.5) / nbx
    ucy = (cby.astype(jnp.float32) + 0.5) / nby

    centers_t = jnp.stack(
        [cx_s, cy_s, cz_s, cr_s, cg_s, cc_s,
         jnp.zeros_like(cx_s), jnp.zeros_like(cx_s)],
        axis=1,
    )  # [n8, 8]
    nudge_f = matvec3(
        jnp.asarray(dirs_np) * jnp.float32(0.2), inv_cell
    ).reshape(-1)  # [3K]

    kern = _make_kernel(
        k_dirs, n_seg, dirs_np, float(r_probe), tuple(int(g) for g in grid)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec(
                (CHUNK, 8), lambda i, r0b, *_: (r0b[i], 0)
            ),
            pl.BlockSpec((5, m_pad), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK, k_dirs), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, CHUNK, k_dirs), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, CHUNK, k_dirs), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, CHUNK, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, CHUNK, 1), lambda i, *_: (i, 0, 0)),
        ],
    )
    valid, ipt, inu, gis, rs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, CHUNK, k_dirs), jnp.bool_),
            jax.ShapeDtypeStruct((n_slots, CHUNK, k_dirs), jnp.int32),
            jax.ShapeDtypeStruct((n_slots, CHUNK, k_dirs), jnp.int32),
            jax.ShapeDtypeStruct((n_slots, CHUNK, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, CHUNK, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        (r0 // CHUNK).astype(jnp.int32), st3.astype(jnp.int32),
        has.astype(jnp.int32), ucx, ucy,
        cell.astype(jnp.float32).reshape(-1),
        inv_cell.astype(jnp.float32).reshape(-1), nudge_f,
        centers_t, tab,
    )

    rows = r0[:, None] + jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    # restrict to the slot's own (unclamped) natural range so clamped
    # tail slots cannot double-count rows, AND to the column's bounds
    live = (
        (rows >= jnp.maximum(cb, nat)[:, None])
        & (rows < jnp.minimum(c_bounds[cc + 1], nat + CHUNK)[:, None])
    )
    s_tot = n_slots * CHUNK
    valid = (valid & live[:, :, None]).reshape(s_tot, k_dirs)
    gis = jnp.where(live, gis[:, :, 0], -1.0).reshape(s_tot)
    return (
        valid, ipt.reshape(s_tot, k_dirs), inu.reshape(s_tot, k_dirs),
        gis.astype(jnp.int32), rs.reshape(s_tot), missed,
    )


def void_masks_points_pallas(
    frac_atoms,  # f32[N, 3], no padding rows
    cell,
    radii,  # f32[N]
    grid,
    probe: float,
    chan: float,
    nbx: int,
    nby: int,
    window: int,
    pts_tiled=None,  # f32[T, P, 3] fractional MC points, tile-assigned
    interpret: bool | None = None,
):
    """Pallas twin of ``grid_kernel.void_masks_columns`` (voxel masks +
    optional MC point fits) with the same contract:
    (mask_probe, mask_chan, fit_pts or None, missed).

    Same factorized per-subcolumn quadratic as the XLA pass
    (d2(u) = QQ + a*u^2 + u*QZ2 over the z-minimum-imaged offset u) and
    the same aligned-start full-run windows as the surface kernel; the
    MC points reuse each segment's candidate loads instead of paying a
    second sweep. Alien rows beyond the 3x3 column neighborhood are >
    reach from every tile voxel/point by construction, so the extended
    windows cannot flip any compare (masks are exactly
    ``distance_grid(...) >= probe/chan`` up to f32 rounding, reference
    semantics amof/pore/pysimmzeopp.py:119-128).
    """
    from amof_tpu.pore import grid_kernel

    if interpret is None:
        interpret = _interpret()
    gx, gy, gz = grid
    assert gx % nbx == 0 and gy % nby == 0
    tvx, tvy = gx // nbx, gy // nby
    n_tiles = nbx * nby
    n_sub = tvx * tvy
    s8 = -(-n_sub // 8) * 8
    gz8 = -(-gz // 8) * 8
    stride = nby + 2
    w_pad = (-(-window // SEG) + 1) * SEG
    n_seg = w_pad // SEG
    two_masks = probe != chan
    thr_hi = np.float32(float(max(probe, chan)))
    thr_lo = np.float32(float(min(probe, chan)))
    # subcolumn groups bound per-segment d2 working sets (~[GRP, gz, 128])
    grp = next(g for g in (8, 4, 2, 1) if s8 % (g * 8) == 0 or g == 1)
    grp *= 8
    n_grp = -(-s8 // grp)
    s_pad = n_grp * grp

    keys, payload = grid_kernel._sort_atoms_xycols(
        frac_atoms, [radii], nbx, nby
    )
    m_rows = keys.shape[0]
    m_pad = -(-(m_rows + w_pad) // SEG) * SEG
    dead = jnp.tile(
        jnp.array([[1e6], [1e6], [1e6], [-10.0]], jnp.float32),
        (1, m_pad - m_rows),
    )
    tab = jnp.concatenate([payload, dead], axis=1)
    cstarts = jnp.searchsorted(
        keys, jnp.arange(nbx * stride + 1, dtype=jnp.float32)
    ).astype(jnp.int32)

    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    t_i, t_j = t_ids // nby, t_ids % nby
    c0 = (
        ((t_i[:, None] + jnp.array([-1, 0, 1])[None, :]) % nbx) * stride
        + t_j[:, None]
    )
    st = cstarts[c0.reshape(-1)].reshape(n_tiles, 3)
    en = cstarts[(c0 + 3).reshape(-1)].reshape(n_tiles, 3)
    missed = jnp.any((en - st) > window)
    st3 = jnp.minimum((st // SEG) * SEG, m_pad - w_pad)
    ucx = (t_i.astype(jnp.float32) + 0.5) / nbx
    ucy = (t_j.astype(jnp.float32) + 0.5) / nby
    cell_z = cell[2]
    a_zz = jnp.sum(cell_z * cell_z).reshape(1)

    with_pts = pts_tiled is not None
    if with_pts:
        p_raw = pts_tiled.shape[1]
        p8 = -(-max(p_raw, 1) // 8) * 8
        pts = pts_tiled
        if p8 != p_raw:
            pts = jnp.pad(
                pts, ((0, 0), (0, p8 - p_raw), (0, 0)),
                constant_values=0.5,
            )
        v_cart = matvec3(pts, cell)
        pts_op = jnp.stack(
            [v_cart[..., 0], v_cart[..., 1], v_cart[..., 2],
             pts[..., 2]],
            axis=1,
        )[..., None]  # [T, 4, P8, 1]
        thr_fit = np.float32(float(probe))
    else:
        p8 = 8
        pts_op = jnp.zeros((n_tiles, 4, p8, 1), jnp.float32)
        thr_fit = np.float32(0.0)

    f_tvx = np.float32(tvx)
    f_gx, f_gy, f_gz = (np.float32(v) for v in (gx, gy, gz))
    i_tvy = np.int32(tvy)

    def kern(seg_ref, ucx_ref, ucy_ref, cell_ref, azz_ref,
             pts_ref, tab_ref, hi_ref, lo_ref, fit_ref,
             hi_s, lo_s, fit_s):
        i = pl.program_id(0)
        ti = (i // nby).astype(jnp.float32)
        tj = (i % nby).astype(jnp.float32)
        cx = ucx_ref[i]
        cy = ucy_ref[i]
        c = [cell_ref[j] for j in range(9)]
        azz = azz_ref[0]

        sub = jax.lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
        lx = (sub // i_tvy).astype(jnp.float32)
        ly = (sub % i_tvy).astype(jnp.float32)
        sub_fx = ((ti * f_tvx) + lx + 0.5) / f_gx
        sub_fy = ((tj * np.float32(tvy)) + ly + 0.5) / f_gy
        vz = (
            jax.lax.broadcasted_iota(jnp.int32, (gz8, 1), 0)
            .astype(jnp.float32) + 0.5
        ) / f_gz

        if with_pts:
            px = pts_ref[0, 0, :, :]
            py = pts_ref[0, 1, :, :]
            pz = pts_ref[0, 2, :, :]
            vfz = pts_ref[0, 3, :, :]

        # fori over segments (not a python unroll): Mosaic keeps every
        # unrolled iteration's [grp, gz8, SEG] temps live on the scoped
        # vmem stack simultaneously — 9 segments x 5 groups OOMed the
        # 16 MB limit at glass bench shapes. A loop body compiles once
        # and reuses its buffers. Accumulators live in VMEM SCRATCH
        # (not loop carries: this target's Mosaic cannot legalize
        # scf.for with carried vectors — "failed to legalize operation
        # 'scf.for'" on hardware, though interpret mode accepts it).
        hi_s[:] = jnp.ones((s_pad, gz8), jnp.bool_)
        lo_s[:] = jnp.ones((s_pad, gz8), jnp.bool_)
        fit_s[:] = jnp.ones((p8, 1), jnp.bool_)

        def seg_body(k, carry):
            st = pl.multiple_of(seg_ref[i, k], SEG)
            sl = pl.ds(st, SEG)
            fxr = tab_ref[pl.ds(0, 1), sl]
            fyr = tab_ref[pl.ds(1, 1), sl]
            fzr = tab_ref[pl.ds(2, 1), sl]
            wrr = tab_ref[pl.ds(3, 1), sl]
            fxc = fxr - jnp.round(fxr - cx)
            fyc = fyr - jnp.round(fyr - cy)
            # dead pad rows inert (see surface kernel note)
            dead_r = wrr < 0
            th = jnp.where(dead_r, jnp.float32(-1.0), (wrr + thr_hi) ** 2)
            tl = (
                jnp.where(dead_r, jnp.float32(-1.0), (wrr + thr_lo) ** 2)
                if two_masks else None
            )

            # voxel part: factorized quadratic, [grp, gz8, SEG]
            dz = vz[:, :] - fzr  # [gz8, SEG]
            u = dz - jnp.round(dz)
            uu = azz * (u * u)
            for g in range(n_grp):
                sx = sub_fx[g * grp:(g + 1) * grp]  # [grp, 1]
                sy = sub_fy[g * grp:(g + 1) * grp]
                dfx = sx - fxc  # [grp, SEG]
                dfy = sy - fyc
                qx = dfx * c[0] + dfy * c[3]
                qy = dfx * c[1] + dfy * c[4]
                qz = dfx * c[2] + dfy * c[5]
                qq = qx * qx + qy * qy + qz * qz
                qdz = (qx * c[6] + qy * c[7] + qz * c[8]) * 2.0
                d2 = (
                    qq[:, None, :] + uu[None, :, :]
                    + u[None, :, :] * qdz[:, None, :]
                )  # [grp, gz8, SEG]
                gs = slice(g * grp, (g + 1) * grp)
                hi_s[gs, :] = hi_s[gs, :] & jnp.all(
                    d2 >= th[None], axis=2
                )
                if two_masks:
                    lo_s[gs, :] = lo_s[gs, :] & jnp.all(
                        d2 >= tl[None], axis=2
                    )

            if with_pts:
                wcx = fxc * c[0] + fyc * c[3] + fzr * c[6]
                wcy = fxc * c[1] + fyc * c[4] + fzr * c[7]
                wcz = fxc * c[2] + fyc * c[5] + fzr * c[8]
                zs = jnp.round(vfz - fzr)
                dx = px - wcx - zs * c[6]
                dy = py - wcy - zs * c[7]
                dzp = pz - wcz - zs * c[8]
                d2p = dx * dx + dy * dy + dzp * dzp
                thf = jnp.where(
                    dead_r, jnp.float32(-1.0), (wrr + thr_fit) ** 2
                )
                fit_s[:, :] = fit_s[:, :] & jnp.all(
                    d2p >= thf, axis=1, keepdims=True,
                )
            return carry

        jax.lax.fori_loop(0, 3 * n_seg, seg_body, 0)

        hi_ref[0] = hi_s[:s8, :gz]
        if two_masks:
            lo_ref[0] = lo_s[:s8, :gz]
        else:
            lo_ref[0] = hi_s[:s8, :gz]
        if with_pts:
            fit_ref[0] = fit_s[:, :]
        else:
            fit_ref[0] = jnp.zeros((p8, 1), jnp.bool_)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4, p8, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((4, m_pad), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s8, gz), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, s8, gz), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p8, 1), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_pad, gz8), jnp.bool_),
            pltpu.VMEM((s_pad, gz8), jnp.bool_),
            pltpu.VMEM((p8, 1), jnp.bool_),
        ],
    )
    seg_starts = (
        st3[:, :, None]
        + jnp.arange(n_seg, dtype=jnp.int32)[None, None, :] * SEG
    ).reshape(n_tiles, 3 * n_seg)
    m_hi, m_lo, fit = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, s8, gz), jnp.bool_),
            jax.ShapeDtypeStruct((n_tiles, s8, gz), jnp.bool_),
            jax.ShapeDtypeStruct((n_tiles, p8, 1), jnp.bool_),
        ],
        interpret=interpret,
    )(
        seg_starts.astype(jnp.int32), ucx, ucy,
        cell.astype(jnp.float32).reshape(-1), a_zz,
        pts_op, tab,
    )

    def to_grid(m):
        g = m[:, :n_sub].reshape(nbx, nby, tvx, tvy, gz)
        return g.transpose(0, 2, 1, 3, 4).reshape(gx, gy, gz)

    if probe >= chan:
        m_probe_t, m_chan_t = m_hi, m_lo
    else:
        m_probe_t, m_chan_t = m_lo, m_hi
    fit_out = fit[:, :p_raw, 0] if with_pts else None
    return to_grid(m_probe_t), to_grid(m_chan_t), fit_out, missed
