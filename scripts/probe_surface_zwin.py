"""Probe: the z-windowed surface-validity kernel shape on real TPU.

Models the production redesign of ``surface_valid_columns``'s blocker
pass (the dominant pore term: 13.9 ms/frame porous, 9.1 dense): per
(chunk, subcolumn) MAIN z-window + WRAP window over the y-duplicated,
z-sorted blocker table, realized as dynamic 128-lane segments inside a
Pallas kernel with scalar-prefetched (start, width) tables.

De-risks, in one go:
  - SMEM capacity for an i32[n_slots, 36] prefetch table
  - nested fori_loop with DYNAMIC trip count (ceil(width/seg))
  - [P, 1] sublane x [1, seg] lane broadcasting of the d2 compare
  - width masking of the padded tail lanes
  - bool [P, 1] output blocks

Correctness: elementwise match vs an XLA oracle computing the same
windows with lax.dynamic_slice. Perf: compared against the same
compute over full 3x736 production windows (the current cost model).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_surface_zwin.py
"""

import sys
import time

import numpy as np

SEG = 128
NW = 18  # 9 main + 9 wrap windows per slot


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # porous bench shapes: 9792 atoms, 64 columns, chunk=32, K=8
    n_slots, P = 512, 256
    M = 3 * 9792 + SEG
    probe_r = 1.2
    rng = np.random.default_rng(7)

    # blocker table [5, M]: fx, fy, fz, r, gid
    tab = np.empty((5, M), np.float32)
    tab[0] = rng.random(M)
    tab[1] = rng.random(M)
    tab[2] = rng.random(M)
    tab[3] = rng.uniform(1.1, 1.8, M)
    tab[4] = rng.integers(0, 9792, M).astype(np.float32)

    # pts [n_slots, 5, P, 1]: px, py, pz (cart), fpz, gid
    box = 46.27
    pts = np.empty((n_slots, 5, P, 1), np.float32)
    pts[:, 0:3] = rng.uniform(0, box, (n_slots, 3, P, 1))
    pts[:, 3] = rng.random((n_slots, P, 1))
    pts[:, 4] = rng.integers(0, 9792, (n_slots, P, 1)).astype(np.float32)

    cell9 = np.array(
        [box, 0, 0, 0, box, 0, 0, 0, box], np.float32
    )
    ucx = rng.random(n_slots).astype(np.float32)
    ucy = rng.random(n_slots).astype(np.float32)

    # window tables: mean main width ~90, wrap ~20 on 46% of slots
    wtab = np.zeros((n_slots, 2 * NW), np.int64)
    wd_m = rng.integers(40, 140, (n_slots, 9))
    wd_w = np.where(
        rng.random((n_slots, 9)) < 0.46, rng.integers(4, 48, (n_slots, 9)), 0
    )
    wd = np.concatenate([wd_m, wd_w], axis=1)
    st = rng.integers(0, M - 256, (n_slots, NW))
    wtab[:, :NW] = st
    wtab[:, NW:] = wd
    wtab = wtab.astype(np.int32)
    mean_cand = float(wd.sum(axis=1).mean())

    tab_j = jnp.asarray(tab)
    pts_j = jnp.asarray(pts)
    wtab_j = jnp.asarray(wtab)
    ucx_j, ucy_j = jnp.asarray(ucx), jnp.asarray(ucy)
    cell_j = jnp.asarray(cell9)

    peps = np.float32(probe_r - 1e-4)

    def kern(wtab_ref, ucx_ref, ucy_ref, cell_ref, pts_ref, tab_ref,
             out_ref):
        i = pl.program_id(0)
        px = pts_ref[0, 0]
        py = pts_ref[0, 1]
        pz = pts_ref[0, 2]
        fpz = pts_ref[0, 3]
        gid = pts_ref[0, 4]
        cx = ucx_ref[i]
        cy = ucy_ref[i]
        c00, c01, c02 = cell_ref[0], cell_ref[1], cell_ref[2]
        c10, c11, c12 = cell_ref[3], cell_ref[4], cell_ref[5]
        c20, c21, c22 = cell_ref[6], cell_ref[7], cell_ref[8]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SEG), 1)

        def win_body(w, valid):
            st0 = wtab_ref[i, w]
            wdw = wtab_ref[i, NW + w]
            nsegs = pl.cdiv(wdw, SEG)

            def seg_body(k, v):
                stk = st0 + k * SEG
                rem = wdw - k * SEG
                msk = lane < rem
                sl = pl.ds(stk, SEG)
                wxf = tab_ref[pl.ds(0, 1), sl]
                wyf = tab_ref[pl.ds(1, 1), sl]
                wzf = tab_ref[pl.ds(2, 1), sl]
                wr = tab_ref[pl.ds(3, 1), sl]
                wg = tab_ref[pl.ds(4, 1), sl]
                wx = wxf - jnp.round(wxf - cx)
                wy = wyf - jnp.round(wyf - cy)
                wcx = wx * c00 + wy * c10 + wzf * c20
                wcy = wx * c01 + wy * c11 + wzf * c21
                wcz = wx * c02 + wy * c12 + wzf * c22
                zs = jnp.round(fpz - wzf)
                dx = px - wcx - zs * c20
                dy = py - wcy - zs * c21
                dz = pz - wcz - zs * c22
                d2 = dx * dx + dy * dy + dz * dz
                thr = (wr + peps) ** 2
                dead = (wg == gid) | jnp.logical_not(msk)
                thr_eff = jnp.where(dead, jnp.float32(-1.0), thr)
                okw = jnp.all(d2 > thr_eff, axis=1, keepdims=True)
                return v & okw

            return jax.lax.fori_loop(0, nsegs, seg_body, valid)

        valid = jax.lax.fori_loop(
            0, NW, win_body, jnp.ones((P, 1), jnp.bool_)
        )
        out_ref[0] = valid

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec((1, 5, P, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((5, M), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, 1), lambda i, *_: (i, 0, 0)),
    )
    interpret = jax.devices()[0].platform == "cpu"
    run = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, P, 1), jnp.bool_),
        interpret=interpret,
    )

    @jax.jit
    def pallas_probe(wtab, ucx, ucy, cell, pts, tab):
        return jnp.sum(
            run(wtab, ucx, ucy, cell, pts, tab).astype(jnp.int32)
        )

    @jax.jit
    def xla_oracle(wtab, ucx, ucy, cell, pts, tab):
        cz = cell.reshape(3, 3)[2]

        def one_slot(wt, cx, cy, pt):
            px, py, pz, fpz, gid = (pt[j] for j in range(5))

            def one_win(w, valid):
                st0, wdw = wt[w], wt[NW + w]
                st0 = jnp.minimum(st0, M - 512)
                win = jax.lax.dynamic_slice(tab, (0, st0), (5, 512))
                idx = jnp.arange(512)[None, :]
                wxf, wyf, wzf, wr, wg = (win[j:j + 1] for j in range(5))
                wx = wxf - jnp.round(wxf - cx)
                wy = wyf - jnp.round(wyf - cy)
                wc = jnp.stack([wx[0], wy[0], wzf[0]], -1) @ cell.reshape(3, 3)
                zs = jnp.round(fpz - wzf)
                dx = px - wc[None, :, 0] - zs * cz[0]
                dy = py - wc[None, :, 1] - zs * cz[1]
                dz = pz - wc[None, :, 2] - zs * cz[2]
                d2 = dx * dx + dy * dy + dz * dz
                thr = (wr + peps) ** 2
                dead = (wg == gid) | (idx >= wdw)
                thr_eff = jnp.where(dead, -1.0, thr)
                return valid & jnp.all(d2 > thr_eff, axis=1, keepdims=True)

            return jax.lax.fori_loop(
                0, NW, one_win, jnp.ones((P, 1), jnp.bool_)
            )

        return jax.vmap(one_slot)(wtab, ucx, ucy, pts[:, :, :, 0])

    # production-cost reference: same compute over full 3x736 windows
    W_FULL = 736

    @jax.jit
    def xla_full(pts, tab):
        cell = cell_j.reshape(3, 3)
        cz = cell[2]

        def one_slot(pt, s0):
            px, py, pz, fpz, gid = (pt[j] for j in range(5))
            valid = jnp.ones((P, 1), jnp.bool_)
            for s in range(3):
                win = jax.lax.dynamic_slice(
                    tab, (0, s0 + s * 2048), (5, W_FULL)
                )
                wxf, wyf, wzf, wr, wg = (win[j:j + 1] for j in range(5))
                wx = wxf - jnp.round(wxf - 0.5)
                wy = wyf - jnp.round(wyf - 0.5)
                wc = jnp.stack([wx[0], wy[0], wzf[0]], -1) @ cell
                zs = jnp.round(fpz - wzf)
                dx = px - wc[None, :, 0] - zs * cz[0]
                dy = py - wc[None, :, 1] - zs * cz[1]
                dz = pz - wc[None, :, 2] - zs * cz[2]
                d2 = dx * dx + dy * dy + dz * dz
                thr = jnp.where(wg == gid, -1.0, (wr + peps) ** 2)
                valid = valid & jnp.all(d2 > thr, axis=1, keepdims=True)
            return valid

        s0s = jnp.asarray(
            rng.integers(0, M - 3 * 2048, n_slots), jnp.int32
        )
        # production slot count at chunk=64: 256 slots x P=512 points
        # == 512 slots x P=256 here, so per-frame cost is comparable
        return jnp.sum(
            jax.vmap(one_slot)(pts[:, :, :, 0], s0s).astype(jnp.int32)
        )

    args = (wtab_j, ucx_j, ucy_j, cell_j, pts_j, tab_j)
    print(f"devices={jax.devices()} mean_cand/pt={mean_cand:.0f} "
          f"vs full={3 * W_FULL}", file=sys.stderr)
    t0 = time.time()
    v = float(np.asarray(pallas_probe(*args)))
    print(f"pallas zwin: compile+run {time.time() - t0:.1f}s chk={v}")
    ok_p = np.asarray(jax.jit(run)(*args))
    ok_r = np.asarray(xla_oracle(*args))[..., None]
    np.testing.assert_array_equal(ok_p, ok_r)
    n_true = int(ok_r.sum())
    assert 0 < n_true < ok_r.size, "degenerate oracle"
    print(f"oracle: elementwise match, {n_true}/{ok_r.size} ok")

    def best_ms(fn, *a):
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(np.asarray(fn(*a)))
            ts.append(time.time() - t0)
        return min(ts) * 1e3

    print(f"pallas zwin:  {best_ms(pallas_probe, *args):.2f} ms "
          f"({n_slots} slots x {P} pts, ~{mean_cand:.0f} cands/pt)")
    t0 = time.time()
    v = float(np.asarray(xla_full(pts_j, tab_j)))
    print(f"xla full: compile+run {time.time() - t0:.1f}s chk={v}")
    print(f"xla full:     {best_ms(xla_full, pts_j, tab_j):.2f} ms "
          f"({n_slots} slots x {P} pts, {3 * W_FULL} cands/pt)")


if __name__ == "__main__":
    main()
