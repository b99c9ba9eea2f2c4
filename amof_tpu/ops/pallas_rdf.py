"""
Pallas TPU kernel: fused minimum-image pair-distance histogram.

The speed-of-light version of ``pair_engine.frame_rdf_counts``: one pass
over (i, j) atom tiles computes triclinic minimum-image distances,
species-pair-combined bin keys, and accumulates the histogram as
hi/lo one-hot contractions on the MXU — all VMEM-resident (the XLA
version spills one-hot blocks to HBM; this kernel's working set is a
few hundred KB).

Layouts:
  * atoms_i f32[N, 8]: per-atom row (x, y, z, species, 0...) — i side
    loads [TI, 8] tiles (sublane-major for row broadcasts);
  * atoms_j f32[8, N]: transposed copy — j side loads [8, TJ] tiles
    (lane-major so coordinates broadcast along lanes);
  * scalars (inv_cell, cell, 1/dr) ride in a scalar-prefetch vector.

Each unordered pair is counted once (i < j; the caller symmetrizes),
and the grid enumerates only j-tiles that can contain j > i. The
histogram output is [S^2 * bins] rounded up to a [H, 128] block with a
sentinel row absorbing masked pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 128  # lane width of the histogram decomposition

WRAP_EPS = 1e-7

# packed-histogram VMEM budget: the blocked kernel keeps the whole
# [S^2, p*hi2, LO] output + the acc/key scratch VMEM-resident; cap the
# estimate well under the ~16 MB/core so tiles and pipelining fit too
PACK_VMEM_BUDGET = 10 * 2 ** 20


def _band_rows(bins: int, pk: int) -> int:
    """One-hot rows per packed band (+ sentinel), rounded to the
    8-sublane Mosaic granule so band concatenation stays aligned."""
    raw = -(-bins // (LO // pk)) + 1
    return -(-raw // 8) * 8


def resolve_packing(bins: int, g: int, n_species: int,
                    ti: int, tj: int) -> int:
    """Quadrant-packing factor for ``pallas_rdf_counts_blocked(p="auto")``.

    Hardware-measured (v5e, 10240 atoms, 4 species, 1371 bins,
    2026-08-18): p=4 runs 9.9 ms/frame vs p=2 14.8 and p=1 21.2 —
    per-pair one-hot compares are (band_rows + 128/p), minimized near
    p=4, and the int8 MXU absorbs the p-fold M-side growth. So prefer
    p=4, then p=2, gated only by (a) g divisibility, (b) a bounded
    one-hot M side, and (c) the packed output + scratch fitting the
    VMEM budget (the output block scales ~p^2 via per-band bin
    coverage). Every p is bit-exact (streams occupy disjoint
    (band, lane-quadrant) blocks; cross terms are discarded).
    """
    s2 = n_species * n_species
    for cand in (4, 2):
        hi2c = _band_rows(bins, cand)
        vmem = (
            s2 * cand * hi2c * LO * 4   # output block (f32)
            + cand * hi2c * LO * 4      # acc scratch (i32)
            + 2 * ti * tj * 4           # key scratch (i32)
        )
        if g % cand == 0 and cand * hi2c <= 512 and vmem <= PACK_VMEM_BUDGET:
            return cand
    return 1


def _kernel(scalars, atoms_i_ref, atoms_j_ref, out_ref, acc_ref,
            kh_ref, kl_ref, *, n_species, bins, ti, tj, hi, n_atoms):
    i_t = pl.program_id(0)
    j_t = pl.program_id(1)
    total = n_species * n_species * bins

    @pl.when(jnp.logical_and(i_t == 0, j_t == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # triangular skip: this j-tile must be able to contain j > i
    @pl.when((j_t + 1) * tj > i_t * ti)
    def _compute():
        _tile_body(scalars, atoms_i_ref, atoms_j_ref, out_ref, acc_ref,
                   kh_ref, kl_ref, i_t, j_t, n_species, bins, ti, tj, hi,
                   n_atoms)


def _tile_body(scalars, atoms_i_ref, atoms_j_ref, out_ref, acc_ref,
               kh_ref, kl_ref, i_t, j_t, n_species, bins, ti, tj, hi,
               n_atoms):
    total = n_species * n_species * bins
    # tile coordinates
    xi = atoms_i_ref[:, 0:3]  # [TI, 3]
    si = atoms_i_ref[:, 3:4]  # [TI, 1] (species as float, -1 padding)
    xj = atoms_j_ref[0:3, :]  # [3, TJ]
    sj = atoms_j_ref[3:4, :]  # [1, TJ]

    # raw deltas per coordinate: [TI, TJ]
    dx = xj[0:1, :] - xi[:, 0:1]
    dy = xj[1:2, :] - xi[:, 1:2]
    dz = xj[2:3, :] - xi[:, 2:3]

    # fractional wrap (row-vector convention: f = d @ inv_cell)
    inv = [scalars[k] for k in range(9)]  # inv_cell row-major
    cel = [scalars[9 + k] for k in range(9)]  # cell row-major
    inv_dr = scalars[18]
    fx = dx * inv[0] + dy * inv[3] + dz * inv[6]
    fy = dx * inv[1] + dy * inv[4] + dz * inv[7]
    fz = dx * inv[2] + dy * inv[5] + dz * inv[8]
    fx = fx - jnp.floor(fx + (0.5 + WRAP_EPS))
    fy = fy - jnp.floor(fy + (0.5 + WRAP_EPS))
    fz = fz - jnp.floor(fz + (0.5 + WRAP_EPS))
    wx = fx * cel[0] + fy * cel[3] + fz * cel[6]
    wy = fx * cel[1] + fy * cel[4] + fz * cel[7]
    wz = fx * cel[2] + fy * cel[5] + fz * cel[8]
    d = jnp.sqrt(wx * wx + wy * wy + wz * wz)

    b = jnp.floor(d * inv_dr).astype(jnp.int32)  # [TI, TJ]
    pair = (si.astype(jnp.int32) * n_species + sj.astype(jnp.int32))
    key = pair * bins + b

    gi = i_t * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    gj = j_t * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    valid = (
        (gi < gj)
        & (si >= 0)
        & (sj >= 0)
        & (b < bins)
        & (gj < n_atoms)
    )
    key = jnp.where(valid, key, total)  # sentinel -> last hi row

    # int32 keys: int16 scratch halves compare width but Mosaic cannot
    # prove single-row dynamic slices against the (16, 128) int16 tiling
    kh_ref[:] = jnp.right_shift(key, 7)  # [TI, TJ]
    kl_ref[:] = jnp.bitwise_and(key, LO - 1)

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hi, 1), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LO, 1), 0)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def row_body(r, _):
        krh = kh_ref[pl.ds(r, 1), :]  # [1, TJ]
        krl = kl_ref[pl.ds(r, 1), :]
        # int8 one-hots: 0/1 exact, and the v5e MXU runs int8 at 2x the
        # bf16 rate; per-dot partial counts <= TJ fit int32 trivially
        oh_h = (krh == iota_h).astype(jnp.int8)  # [H, TJ]
        oh_l = (krl == iota_l).astype(jnp.int8)  # [LO, TJ]
        acc_ref[:] += jax.lax.dot_general(
            oh_h, oh_l,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return 0

    jax.lax.fori_loop(0, ti, row_body, 0)
    out_ref[:] += acc_ref[:].astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_species", "bins", "ti", "tj", "interpret"),
)
def pallas_rdf_counts(
    positions,  # [N, 3] f32, padded N (species -1 marks padding)
    cell,  # [3, 3]
    species_idx,  # [N] i32
    dr,
    n_species: int,
    bins: int,
    ti: int = 256,
    tj: int = 512,
    interpret: bool = False,
):
    """Species-pair distance histogram [S, S, bins] of one frame
    (drop-in for pair_engine.frame_rdf_counts, ordered counts)."""
    n = positions.shape[0]
    total = n_species * n_species * bins
    hi = -(-total // LO) + 1  # sentinel row included

    sp_f = species_idx.astype(jnp.float32)
    atoms_i = jnp.concatenate(
        [positions, sp_f[:, None], jnp.zeros((n, 4), jnp.float32)], axis=1
    )  # [N, 8]
    atoms_j = atoms_i.T.reshape(8, n)  # transpose once in XLA

    inv_cell = jnp.linalg.inv(cell)
    scalars = jnp.concatenate(
        [inv_cell.reshape(-1), cell.reshape(-1),
         jnp.array([1.0 / dr], cell.dtype)]
    ).astype(jnp.float32)

    n_i = -(-n // ti)
    n_j = -(-n // tj)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((ti, 8), lambda i, j, s: (i, 0)),
            pl.BlockSpec((8, tj), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((hi, LO), lambda i, j, s: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hi, LO), jnp.int32),
            pltpu.VMEM((ti, tj), jnp.int32),
            pltpu.VMEM((ti, tj), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _kernel, n_species=n_species, bins=bins, ti=ti, tj=tj, hi=hi,
        n_atoms=n,
    )
    counts2d = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hi, LO), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, atoms_i, atoms_j)

    half = counts2d.reshape(-1)[:total].reshape(n_species, n_species, bins)
    return half + half.transpose(1, 0, 2)


# --------------------------------------------------------------------------
# Species-blocked variant: atoms grouped by species, so a tile holds ONE
# species pair and the histogram key shrinks to the bin index alone
# --------------------------------------------------------------------------

def species_block_layout(species_idx, block: int = 1024,
                         total_multiple: int = 256):
    """Host-side re-layout: group atoms by species, pad each group to a
    multiple of ``block`` (pad species -1), pad the total to
    ``total_multiple``. Histograms are permutation-invariant, so every
    kernel downstream accepts the layout unchanged.

    Returns (perm, padded_species) where ``perm`` indexes the original
    atom axis (apply with np.take(..., axis=-2)) and ``padded_species``
    marks pads with -1; real atoms appear in perm order.
    """
    species_idx = np.asarray(species_idx)
    order = np.argsort(species_idx, kind="stable")
    order = order[species_idx[order] >= 0]  # existing pads re-created
    uniq = np.unique(species_idx[species_idx >= 0])
    perm_parts, sp_parts = [], []
    for s in uniq:
        grp = order[species_idx[order] == s]
        pad = (-len(grp)) % block
        perm_parts.append(grp)
        sp_parts.append(np.full(len(grp), s, np.int32))
        if pad:
            perm_parts.append(np.full(pad, -1, np.int64))
            sp_parts.append(np.full(pad, -1, np.int32))
    perm = np.concatenate(perm_parts)
    sp = np.concatenate(sp_parts)
    tail = (-len(sp)) % max(total_multiple, block)
    if tail:
        perm = np.concatenate([perm, np.full(tail, -1, np.int64)])
        sp = np.concatenate([sp, np.full(tail, -1, np.int32)])
    return perm, sp


def apply_atom_layout(positions, perm):
    """Gather positions [..., N, 3] into layout order; pads (-1) get 0."""
    safe = np.maximum(perm, 0)
    out = np.take(positions, safe, axis=-2)
    out[..., perm < 0, :] = 0.0
    return np.ascontiguousarray(out)


def _kernel_blocked(scalars, atoms_i_ref, atoms_j_ref, out_ref, acc_ref,
                    kh_ref, kl_ref, *, n_species, bins, ti, tj, hi2,
                    n_atoms, g, p, ortho=False):
    i_t = pl.program_id(0)
    j_t = pl.program_id(1)

    @pl.when(jnp.logical_and(i_t == 0, j_t == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # tiles are species-block-aligned: a tile whose first species slot
    # is -1 is ALL padding (species_block_layout pads per block), so the
    # whole tile contributes nothing — skip it (the blocked layout adds
    # ~15% pad atoms; this claws the pair work back)
    @pl.when(
        ((j_t + 1) * tj > i_t * ti)
        & (atoms_i_ref[0, 3] >= 0)
        & (atoms_j_ref[3, 0] >= 0)
    )
    def _compute():
        xi = atoms_i_ref[:, 0:3]
        si = atoms_i_ref[:, 3:4]
        xj = atoms_j_ref[0:3, :]
        sj = atoms_j_ref[3:4, :]
        dx = xj[0:1, :] - xi[:, 0:1]
        dy = xj[1:2, :] - xi[:, 1:2]
        dz = xj[2:3, :] - xi[:, 2:3]
        inv = [scalars[k] for k in range(9)]
        cel = [scalars[9 + k] for k in range(9)]
        inv_dr = scalars[18]
        if ortho:
            # diagonal cell (caller-certified): drop the cross terms of
            # both 3x3 transforms. Per-axis ops are identical to the
            # triclinic path with zero off-diagonals, so this is
            # bit-equal to it (verified on v5e: probe_rdf_variants
            # 'ortho' variants, 2026-08-20) while skipping 24 of the
            # ~40 distance madds
            fx = dx * inv[0]
            fy = dy * inv[4]
            fz = dz * inv[8]
        else:
            fx = dx * inv[0] + dy * inv[3] + dz * inv[6]
            fy = dx * inv[1] + dy * inv[4] + dz * inv[7]
            fz = dx * inv[2] + dy * inv[5] + dz * inv[8]
        fx = fx - jnp.floor(fx + (0.5 + WRAP_EPS))
        fy = fy - jnp.floor(fy + (0.5 + WRAP_EPS))
        fz = fz - jnp.floor(fz + (0.5 + WRAP_EPS))
        if ortho:
            wx = fx * cel[0]
            wy = fy * cel[4]
            wz = fz * cel[8]
        else:
            wx = fx * cel[0] + fy * cel[3] + fz * cel[6]
            wy = fx * cel[1] + fy * cel[4] + fz * cel[7]
            wz = fx * cel[2] + fy * cel[5] + fz * cel[8]
        d = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        b = jnp.floor(d * inv_dr).astype(jnp.int32)  # [TI, TJ]

        gi = i_t * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
        gj = j_t * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
        valid = (
            (gi < gj)
            & (si >= 0)
            & (sj >= 0)
            & (b < bins)
            & (gj < n_atoms)
        )
        # blocks are tile-aligned: the whole tile is one species pair.
        # Quadrant packing (p > 1): the 128 histogram lanes split into
        # p quadrants of loq = 128/p, the one-hot M side into p bands
        # of hi2 rows, and p key streams share each contraction column
        # — stream q's one-hots live in band q x quadrant q, so every
        # cross-stream product lands in an off-diagonal (band, quadrant)
        # block that the extraction discards. Per pair this divides the
        # MXU slots, the one-hot VMEM traffic, and the lo-side compares
        # by p (both one-hots are built as concatenations of per-stream
        # compares, one compare per written element).
        loq = LO // p
        lo_bits = loq.bit_length() - 1
        key = jnp.where(valid, b, hi2 * loq - 1)  # in-band sentinel
        kh_ref[:] = jnp.right_shift(key, lo_bits)
        kl_ref[:] = jnp.bitwise_and(key, loq - 1)

        # f32 compares measured ~6% faster than i32 on v5e (Mosaic
        # rejects i8/bf16 vector compares outright — "Target does not
        # support this comparison" — so 32-bit lanes are the floor);
        # key parts are small integers, exactly representable. tpu.iota
        # is int-only on this target: generate i32, convert once.
        iota_h = jax.lax.broadcasted_iota(
            jnp.int32, (hi2, 1), 0
        ).astype(jnp.float32)
        iota_l = jax.lax.broadcasted_iota(
            jnp.int32, (loq, 1), 0
        ).astype(jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        gq = g // p

        # every row in the tile is the same species pair, so row
        # histograms simply add: flatten g rows into one long
        # contraction — one fat dot instead of g thin ones. The
        # per-quadrant compare + concatenate build is deliberate: the
        # "band-offset" [p, hi2, K] broadcast-and-reshape variant that
        # avoids the concatenate measured 12.5 vs 7.6 ms/frame on the
        # porous supercell shapes (bins 2313) while gaining only 0.4
        # on glass (bins 2743) — the reshape is NOT a layout no-op for
        # every (hi2, p) and its relayout cost swamps the saved pass
        # (hardware A/B vs the pre-change kernel, round 5).
        def row_body(r, _):
            oh_h_parts = []
            oh_l_parts = []
            for q in range(p):
                krh = kh_ref[pl.ds(r * g + q * gq, gq), :].astype(
                    jnp.float32
                ).reshape(1, gq * tj)
                krl = kl_ref[pl.ds(r * g + q * gq, gq), :].astype(
                    jnp.float32
                ).reshape(1, gq * tj)
                oh_h_parts.append(krh == iota_h)  # [hi2, gq*TJ]
                oh_l_parts.append(krl == iota_l)  # [loq, gq*TJ]
            oh_h = jnp.concatenate(oh_h_parts, axis=0).astype(jnp.int8)
            oh_l = jnp.concatenate(oh_l_parts, axis=0).astype(jnp.int8)
            acc_ref[:] += jax.lax.dot_general(
                oh_h, oh_l,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return 0

        jax.lax.fori_loop(0, ti // g, row_body, 0)
        sa = jnp.maximum(si[0, 0].astype(jnp.int32), 0)
        sb = jnp.maximum(sj[0, 0].astype(jnp.int32), 0)
        pair_id = sa * n_species + sb
        out_ref[pl.ds(pair_id, 1)] += acc_ref[:].astype(jnp.float32)[None]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_species", "bins", "ti", "tj", "g", "p", "ortho", "interpret",
    ),
)
def pallas_rdf_counts_blocked(
    positions,  # [N', 3] f32 in species_block_layout order
    cell,
    species_idx,  # [N'] i32 from species_block_layout (-1 pads)
    dr,
    n_species: int,
    bins: int,
    ti: int = 256,
    tj: int = 512,
    g: int = 64,
    p="auto",
    ortho: bool = False,
    interpret: bool = False,
):
    """Species-blocked variant of ``pallas_rdf_counts``.

    Requires inputs in ``species_block_layout`` order with the block
    size a multiple of both tile sizes: every (i, j) tile then holds a
    single species pair, so (a) the key space collapses from S^2 * bins
    to ``bins`` (one-hot hi rows fit one MXU M-chunk), (b) row
    histograms within a tile are interchangeable, letting ``g`` rows
    flatten into one contraction of length g*tj (fat dots, ~ti/g loop
    iterations), and (c) each tile accumulates into its pair's
    [hi2, 128] slab of a fully VMEM-resident [S^2, hi2, 128] output.
    Bit-exact vs the unblocked kernel on the same atoms (counts are
    exact integers); ~2.6x faster at 10k atoms/1368 bins on v5e.

    ``p`` packs p key streams per contraction column in disjoint
    (M-band, lane-quadrant) blocks (see _kernel_blocked), dividing the
    per-pair one-hot compares and VMEM traffic by ~p. "auto" (the
    default) resolves via ``resolve_packing`` — p=4 wherever its
    packed output fits VMEM (hardware-measured 2.15x over p=1 at
    production shapes; verified bit-exact on v5e 2026-08-18). Every p
    is bit-exact (integer counts; streams never collide). None means
    p=1.
    """
    n = positions.shape[0]
    assert ti % g == 0, "row group must divide the i-tile"

    if p is None:
        p = 1
    elif p == "auto":
        p = resolve_packing(bins, g, n_species, ti, tj)
    assert g % p == 0 and LO % p == 0, (p, g)
    hi2 = _band_rows(bins, p)

    sp_f = species_idx.astype(jnp.float32)
    atoms_i = jnp.concatenate(
        [positions, sp_f[:, None], jnp.zeros((n, 4), jnp.float32)], axis=1
    )
    atoms_j = atoms_i.T.reshape(8, n)

    inv_cell = jnp.linalg.inv(cell)
    scalars = jnp.concatenate(
        [inv_cell.reshape(-1), cell.reshape(-1),
         jnp.array([1.0 / dr], cell.dtype)]
    ).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(-(-n // ti), -(-n // tj)),
        in_specs=[
            pl.BlockSpec((ti, 8), lambda i, j, s: (i, 0)),
            pl.BlockSpec((8, tj), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec(
            (n_species * n_species, p * hi2, LO), lambda i, j, s: (0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((p * hi2, LO), jnp.int32),
            pltpu.VMEM((ti, tj), jnp.int32),
            pltpu.VMEM((ti, tj), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _kernel_blocked, n_species=n_species, bins=bins, ti=ti, tj=tj,
        hi2=hi2, n_atoms=n, g=g, p=p, ortho=ortho,
    )
    counts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_species * n_species, p * hi2, LO), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, atoms_i, atoms_j)

    # stream q's counts live in (band q, lane-quadrant q); the
    # off-diagonal blocks hold the packed dots' cross terms — drop them
    s2 = n_species * n_species
    loq = LO // p
    diag = counts.reshape(s2, p, hi2, p, loq)
    half = sum(diag[:, q, :, q, :] for q in range(p))
    half = half.reshape(s2, hi2 * loq)[:, :bins]
    half = half.reshape(n_species, n_species, bins)
    return half + half.transpose(1, 0, 2)
