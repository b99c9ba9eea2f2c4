"""Diagnose the slab-table overflow flag at bench shapes (CPU).

Rebuilds the slab layout for one 10240-atom bench frame, simulates the
kernel's per-run key masks in numpy, and compares per-center neighbor
sets (by global index) against a brute-force minimum-image count.
Reports: layout `missed` components, centers with duplicate candidates,
centers with missing neighbors, and cnt vs true-count histograms.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    PYTHONPATH=/root/repo python scripts/debug_slab_miss.py
"""

import sys

import numpy as np


def main():
    import jax.numpy as jnp

    from amof_tpu.ops import pallas_rdf, slab_table
    sys.path.insert(0, "/root/repo")
    from bench import make_trajectory

    batch, box = make_trajectory(2, 10240)
    species = np.asarray(batch.species)
    uniq = np.unique(species)
    z_to_idx = np.zeros(species.max() + 1, np.int32)
    for i, z in enumerate(uniq):
        z_to_idx[z] = i
    sp_idx = z_to_idx[species]
    n_species = len(uniq)

    cut = {"Zn-N": 2.0, "C-C": 1.75, "C-N": 1.73, "C-H": 1.3}
    from amof_tpu.data import elements
    sym_of = {z: elements.symbol_of(z) for z in uniq}
    cutoff_matrix = np.zeros((n_species, n_species), np.float32)
    for spec, rc in cut.items():
        a, b = spec.split("-")
        ia = [i for i, z in enumerate(uniq) if sym_of[z] == a][0]
        ib = [i for i, z in enumerate(uniq) if sym_of[z] == b][0]
        cutoff_matrix[ia, ib] = cutoff_matrix[ib, ia] = rc

    perm, sp_l = pallas_rdf.species_block_layout(sp_idx, block=256)
    pos_l = pallas_rdf.apply_atom_layout(
        np.asarray(batch.positions, np.float32), perm
    )
    n_pad = len(sp_l)
    rc_max = float(cutoff_matrix.max())
    plan = slab_table.slab_plan(np.asarray(batch.cell), rc_max, n_pad)
    print(f"plan={plan}", file=sys.stderr)
    cell = np.asarray(batch.cell, np.float32)[0]

    centers, cand, starts, qbounds, missed = slab_table.build_slab_layout(
        jnp.asarray(pos_l[0]), jnp.asarray(sp_l), jnp.asarray(cell), plan
    )
    centers = np.asarray(centers)
    cand = np.asarray(cand)
    starts = np.asarray(starts)
    qbounds = np.asarray(qbounds)
    print(f"layout missed={bool(missed)}", file=sys.stderr)

    # decompose `missed`: pop>cap and run-capacity separately
    inv = np.linalg.inv(cell.astype(np.float64))
    frac = pos_l[0].astype(np.float64) @ inv
    fx = frac[:, 0] % 1.0
    real = sp_l >= 0
    slab = np.minimum((fx * plan.nsx).astype(int), plan.nsx - 1)
    pop = np.bincount(np.where(real, slab, 0), minlength=plan.nsx)
    # note: layout counts pad rows via RANK-spread fx (slab_table.
    # _pad_spread); recompute identically
    rank = np.cumsum(~real) - 1
    n_pads = max(int((~real).sum()), 1)
    sfx = (rank + 0.5) / n_pads
    fx_all = np.where(real, fx, sfx)
    slab_all = np.minimum((fx_all * plan.nsx).astype(int), plan.nsx - 1)
    pop_all = np.bincount(slab_all, minlength=plan.nsx)
    print(f"pop_all max={pop_all.max()} cap={plan.cap} "
          f"over={np.sum(pop_all > plan.cap)}", file=sys.stderr)

    kb = cand[5]
    w = plan.window
    n_chunks = plan.m_centers // plan.chunk
    # run lengths
    klo = qbounds[:, :, 0].reshape(-1)
    khi = qbounds[:, :, 1].reshape(-1)
    st = np.searchsorted(kb, klo)
    en = np.searchsorted(kb, khi)
    st_al = st & ~127
    over = en - st_al > w
    print(f"run-capacity misses: {over.sum()} / {over.size} "
          f"(max en-st_al={np.max(en - st_al)}, w={w})", file=sys.stderr)
    if over.sum():
        bad = np.argmax(over)
        ci, r = bad // 3, bad % 3
        print(f"  worst chunk={ci} run={r} klo={klo[bad]:.4f} "
              f"khi={khi[bad]:.4f} st={st[bad]} en={en[bad]} "
              f"len={en[bad]-st[bad]}", file=sys.stderr)

    # simulate kernel: per real center, gather accepted candidate gidx
    cut2 = (cutoff_matrix * cutoff_matrix).astype(np.float64)
    chunkc = plan.chunk
    dup_centers = 0
    miss_centers = 0
    max_cnt = 0
    starts_c = np.clip(st_al, 0, plan.m_cand - w).reshape(n_chunks, 3)
    for ci in range(n_chunks):
        cen = centers[ci * chunkc:(ci + 1) * chunkc]
        creal = cen[:, 3] >= 0
        if not creal.any():
            continue
        cols = []
        for r in range(3):
            s0 = starts_c[ci, r]
            seg = slice(s0, s0 + w)
            kr = kb[seg]
            m = (kr >= qbounds[ci, r, 0]) & (kr < qbounds[ci, r, 1])
            cols.append((seg, m))
        xi = cen[:, 0:3].astype(np.float64)
        sii = cen[:, 3].astype(int)
        gii = cen[:, 4].astype(int)
        acc_g = [[] for _ in range(chunkc)]
        for seg, m in cols:
            xj = cand[0:3, seg].T.astype(np.float64)
            sj = cand[3, seg].astype(int)
            gj = cand[4, seg].astype(int)
            d = xj[None] - xi[:, None]
            f = d @ inv
            f -= np.floor(f + 0.5 + 1e-7)
            wvec = f @ cell.astype(np.float64)
            d2 = np.sum(wvec * wvec, axis=-1)
            ok = m[None, :] & (gj[None] != gii[:, None])
            ok &= (sii >= 0)[:, None] & (sj >= 0)[None]
            thr = np.zeros_like(d2)
            vs = np.where(sii >= 0, sii, 0)
            vj = np.where(sj >= 0, sj, 0)
            thr = cut2[vs[:, None], vj[None]]
            ok &= d2 < thr
            for c in range(chunkc):
                if creal[c]:
                    acc_g[c].extend(gj[ok[c]].tolist())
        for c in range(chunkc):
            if not creal[c]:
                continue
            g = acc_g[c]
            max_cnt = max(max_cnt, len(g))
            if len(g) != len(set(g)):
                dup_centers += 1
                if dup_centers <= 3:
                    from collections import Counter
                    dups = [k for k, v in Counter(g).items() if v > 1]
                    print(f"  DUP center g={gii[c]} chunk={ci} "
                          f"dups={dups}", file=sys.stderr)
    print(f"dup_centers={dup_centers} max_cnt={max_cnt}",
          file=sys.stderr)

    # brute-force true counts for centers in a few flagged chunks is
    # expensive; do a global true-count histogram instead
    posr = pos_l[0][real].astype(np.float64)
    spr = sp_idx_sorted = sp_l[real]
    n = posr.shape[0]
    counts = np.zeros(n, int)
    B = 512
    for i0 in range(0, n, B):
        d = posr[None, i0:i0 + B] - posr[:, None]
        f = d @ inv
        f -= np.floor(f + 0.5 + 1e-7)
        wv = f @ cell.astype(np.float64)
        d2 = np.sum(wv * wv, axis=-1)
        thr = cut2[spr[:, None], spr[None, i0:i0 + B]]
        ok = (d2 < thr) & (d2 > 0)
        counts[i0:i0 + B] += ok.sum(axis=0)
    print(f"true max_cnt={counts.max()} "
          f"hist={np.bincount(counts)}", file=sys.stderr)
    print("done")


if __name__ == "__main__":
    main()
