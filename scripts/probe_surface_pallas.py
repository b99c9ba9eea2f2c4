"""Probe: Pallas full-window surface-validity kernel vs the XLA map pass.

Finding that motivates this shape: Mosaic on this target rejects
unaligned dynamic lane slices ("cannot statically prove that index in
dimension 2 is a multiple of 128", scripts/probe_lane_slice.py), so
fine-grained z-windows are out. But the XLA surface pass measures only
~26G pair-tests/s (~8% of VPU f32 peak) — it is bound by materialized
[P, window] intermediates and lax.map step dispatch, not compute. So:
keep the EXACT production candidate windows (3 y-runs x W), align the
dynamic starts DOWN to 128 (extending width by one 128 segment), and
run the compare-accumulate loop in a Pallas kernel with vreg-resident
accumulation. Alignment padding costs ~+17% candidates; alien rows
(neighboring columns) and dead pad rows are provably harmless: every
tested row is a true min-image atom position (round-based unwrap), so
extra tests can only reject points genuinely inside a blocker sphere.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_surface_pallas.py
"""

import sys
import time

import numpy as np

SEG = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # porous bench shapes: 9792 atoms, 64 cols, chunk=64, K=8 dirs
    n_slots, P = 256, 512
    window = 736
    w_pad = (-(-window // SEG) + 1) * SEG  # aligned-start extension
    n_seg = w_pad // SEG
    M = 3 * 9792 + w_pad
    probe_r = 1.2
    rng = np.random.default_rng(7)

    box = 46.27
    tab = np.empty((5, M), np.float32)
    tab[0] = rng.random(M)
    tab[1] = rng.random(M)
    tab[2] = rng.random(M)
    tab[3] = rng.uniform(1.1, 1.8, M)
    tab[4] = rng.integers(0, 9792, M).astype(np.float32)
    # dead tail pad: far away, tiny threshold, unmatched gid
    tab[0:3, 3 * 9792:] = 1e6
    tab[3, 3 * 9792:] = -10.0
    tab[4, 3 * 9792:] = -1.0

    pts = np.empty((n_slots, 5, P, 1), np.float32)
    pts[:, 0:3] = rng.uniform(0, box, (n_slots, 3, P, 1))
    pts[:, 3] = rng.random((n_slots, P, 1))
    pts[:, 4] = rng.integers(0, 9792, (n_slots, P, 1)).astype(np.float32)

    cell9 = np.array([box, 0, 0, 0, box, 0, 0, 0, box], np.float32)
    ucx = rng.random(n_slots).astype(np.float32)
    ucy = rng.random(n_slots).astype(np.float32)

    st_raw = rng.integers(0, 3 * 9792 - window, (n_slots, 3))
    st_al = (st_raw // SEG) * SEG
    st3 = st_al.astype(np.int32)

    tab_j = jnp.asarray(tab)
    pts_j = jnp.asarray(pts)
    st_j = jnp.asarray(st3)
    ucx_j, ucy_j = jnp.asarray(ucx), jnp.asarray(ucy)
    cell_j = jnp.asarray(cell9)
    peps = np.float32(probe_r - 1e-4)

    def kern(st_ref, ucx_ref, ucy_ref, cell_ref, pts_ref, tab_ref,
             out_ref):
        i = pl.program_id(0)
        px = pts_ref[0, 0, :, :]
        py = pts_ref[0, 1, :, :]
        pz = pts_ref[0, 2, :, :]
        fpz = pts_ref[0, 3, :, :]
        gid = pts_ref[0, 4, :, :]
        cx = ucx_ref[i]
        cy = ucy_ref[i]
        c00, c01, c02 = cell_ref[0], cell_ref[1], cell_ref[2]
        c10, c11, c12 = cell_ref[3], cell_ref[4], cell_ref[5]
        c20, c21, c22 = cell_ref[6], cell_ref[7], cell_ref[8]

        valid = jnp.ones((P, 1), jnp.bool_)
        for s in range(3):
            st0 = pl.multiple_of(st_ref[i, s], SEG)
            for k in range(n_seg):
                sl = pl.ds(st0 + k * SEG, SEG)
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
                thr_eff = jnp.where(wg == gid, jnp.float32(-1.0), thr)
                valid = valid & jnp.all(
                    d2 > thr_eff, axis=1, keepdims=True
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

    REP = 16

    @jax.jit
    def pallas_probe(st, ucx, ucy, cell, pts, tab):
        # amortize the ~25 ms tunnel dispatch overhead (CLAUDE.md):
        # lax.map REP iterations inside one jit, divide outside
        def one(u):
            return jnp.sum(
                run(st, u, ucy, cell, pts, tab).astype(jnp.int32)
            )

        return jnp.sum(jax.lax.map(one, jnp.tile(ucx, (REP, 1))))

    @jax.jit
    def xla_oracle(st, ucx, ucy, cell, pts, tab):
        cm = cell.reshape(3, 3)
        cz = cm[2]

        def one_slot(st3, cx, cy, pt):
            px, py, pz, fpz, gid = (pt[j][:, None] for j in range(5))
            valid = jnp.ones((P, 1), jnp.bool_)
            for s in range(3):
                win = jax.lax.dynamic_slice(tab, (0, st3[s]), (5, w_pad))
                wxf, wyf, wzf, wr, wg = (win[j:j + 1] for j in range(5))
                wx = wxf - jnp.round(wxf - cx)
                wy = wyf - jnp.round(wyf - cy)
                wcx = wx * cm[0, 0] + wy * cm[1, 0] + wzf * cm[2, 0]
                wcy = wx * cm[0, 1] + wy * cm[1, 1] + wzf * cm[2, 1]
                wcz = wx * cm[0, 2] + wy * cm[1, 2] + wzf * cm[2, 2]
                zs = jnp.round(fpz - wzf)
                dx = px - wcx - zs * cz[0]
                dy = py - wcy - zs * cz[1]
                dz = pz - wcz - zs * cz[2]
                d2 = dx * dx + dy * dy + dz * dz
                thr = jnp.where(wg == gid, -1.0, (wr + peps) ** 2)
                valid = valid & jnp.all(d2 > thr, axis=1, keepdims=True)
            return valid

        return jax.vmap(one_slot)(st, ucx, ucy, pts[:, :, :, 0])

    # production-cost model: the current lax.map + window pass at the
    # same shapes (W=736 per slice, no alignment pad, batched c_batch=8)
    @jax.jit
    def xla_prod(st, ucx, ucy, pts, tab):
        cm = cell_j.reshape(3, 3)
        cz = cm[2]

        def one_batch(args):
            st3, cx, cy, pt = args

            def one_slot(st3, cx, cy, pt):
                px, py, pz, fpz, gid = (pt[j][:, None] for j in range(5))
                valid = None
                for s in range(3):
                    win = jax.lax.dynamic_slice(
                        tab, (0, st3[s]), (5, window)
                    )
                    wxf, wyf, wzf, wr, wg = (win[j:j + 1] for j in range(5))
                    wx = wxf - jnp.round(wxf - cx)
                    wy = wyf - jnp.round(wyf - cy)
                    wcx = wx * cm[0, 0] + wy * cm[1, 0] + wzf * cm[2, 0]
                    wcy = wx * cm[0, 1] + wy * cm[1, 1] + wzf * cm[2, 1]
                    wcz = wx * cm[0, 2] + wy * cm[1, 2] + wzf * cm[2, 2]
                    zs = jnp.round(fpz - wzf)
                    dx = px - wcx - zs * cz[0]
                    dy = py - wcy - zs * cz[1]
                    dz = pz - wcz - zs * cz[2]
                    d2 = dx * dx + dy * dy + dz * dz
                    thr = jnp.where(wg == gid, -1.0, (wr + peps) ** 2)
                    ok = jnp.all(d2 > thr, axis=1, keepdims=True)
                    valid = ok if valid is None else (valid & ok)
                return valid

            outs = [
                one_slot(st3[t], cx[t], cy[t], pt[t]) for t in range(8)
            ]
            return jnp.stack(outs)

        def rep_one(u):
            batched = (
                st.reshape(-1, 8, 3), u.reshape(-1, 8),
                ucy.reshape(-1, 8), pts[:, :, :, 0].reshape(-1, 8, 5, P),
            )
            out = jax.lax.map(one_batch, batched)
            return jnp.sum(out.astype(jnp.int32))

        return jnp.sum(jax.lax.map(rep_one, jnp.tile(ucx, (REP, 1))))

    args = (st_j, ucx_j, ucy_j, cell_j, pts_j, tab_j)
    print(f"devices={jax.devices()}", file=sys.stderr)
    t0 = time.time()
    v = float(np.asarray(pallas_probe(*args)))
    print(f"pallas full-window: compile+run {time.time() - t0:.1f}s chk={v}")
    ok_p = np.asarray(jax.jit(run)(*args))
    ok_r = np.asarray(xla_oracle(*args))
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

    n_tests = REP * n_slots * P * 3 * w_pad / 1e6
    t_p = best_ms(pallas_probe, *args)
    print(f"pallas: {t_p:.2f} ms ({n_tests:.0f}M tests, "
          f"{n_tests / t_p:.1f}G tests/s)")
    t0 = time.time()
    v = float(np.asarray(xla_prod(st_j, ucx_j, ucy_j, pts_j, tab_j)))
    print(f"xla prod-model: compile+run {time.time() - t0:.1f}s chk={v}")
    t_x = best_ms(xla_prod, st_j, ucx_j, ucy_j, pts_j, tab_j)
    n_tests_x = REP * n_slots * P * 3 * window / 1e6
    print(f"xla prod-model: {t_x:.2f} ms ({n_tests_x:.0f}M tests, "
          f"{n_tests_x / t_x:.1f}G tests/s)  speedup={t_x / t_p:.2f}x")


if __name__ == "__main__":
    main()
