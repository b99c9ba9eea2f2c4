"""Per-stage timing of the batched pore column path on the real TPU.

Times, at bench shapes (10240-atom glass, conn_resolution 0.5, mc -vol):
  A. void_masks_columns alone (the connectivity-mask term)
  B. A + void_classification_mask (flood fill)
  C. the full frame_fn (adds surface sampling + MC lookup)
each lax.map'd over K frames inside one jit with a scalar-reduced
output (CLAUDE.md timing discipline). Stage costs are differences.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_pore_stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")  # before any amof_tpu/bench import


def main():
    import jax
    import jax.numpy as jnp

    from amof_tpu.parallel.mesh import analysis_mesh
    from amof_tpu.pore import grid_kernel
    from amof_tpu.pore.batch import BatchedPore
    from bench import make_porous_supercell, make_trajectory

    k = 16
    porous = "--porous" in sys.argv
    if porous:
        # crystalline ZIF-4 supercell at probe 1.0 (percolating
        # channels): the bench's porous workload
        batch, n_atoms = make_porous_supercell(k)
        box = float(batch.cell[0, 0, 0])
        print(f"porous supercell atoms={n_atoms}", file=sys.stderr)
    else:
        batch, box = make_trajectory(k, 10240)
    print(f"devices={jax.devices()} box={box:.2f}", file=sys.stderr)

    bp = BatchedPore(resolution=0.25, vol_method="mc",
                     conn_resolution=0.5,
                     **({"probe_radius": 1.0, "chan_radius": 1.0}
                        if porous else {}))
    step_fn, args, meta = bp.prepare(batch, mesh=analysis_mesh(n_frames=k))
    col_plan, surf_plan = meta["col_plan"], meta["surf_plan"]
    print(f"grid={meta['grid']} col_plan={col_plan} "
          f"surf_plan={surf_plan}", file=sys.stderr)

    from amof_tpu.data import elements
    rad_table = elements.vdw_radius_array()
    radii = jnp.asarray(
        rad_table[np.asarray(batch.species)].astype(np.float32)
    )
    probe = chan = bp.probe_radius
    grid = col_plan["grid"]

    positions = jax.device_put(np.asarray(batch.positions, np.float32))
    cells = jax.device_put(np.asarray(batch.cell, np.float32))

    from amof_tpu.ops.pair_engine import matvec3

    def frac_of(pos, cell):
        f = matvec3(pos, jnp.linalg.inv(cell))
        return f - jnp.floor(f)

    import functools

    @jax.jit
    def stage_a(positions, cells):
        def one(args):
            pos, cell = args
            frac = frac_of(pos, cell)
            m_probe, m_chan, _, miss = grid_kernel.void_masks_columns(
                frac, cell, radii, grid, probe=probe, chan=chan,
                nbx=col_plan["nbx"], nby=col_plan["nby"],
                window=col_plan["window"],
            )
            return jnp.sum(m_chan) + miss
        return jnp.sum(jax.lax.map(one, (positions, cells)))

    @jax.jit
    def stage_b(positions, cells):
        def one(args):
            pos, cell = args
            frac = frac_of(pos, cell)
            m_probe, m_chan, _, miss = grid_kernel.void_masks_columns(
                frac, cell, radii, grid, probe=probe, chan=chan,
                nbx=col_plan["nbx"], nby=col_plan["nby"],
                window=col_plan["window"],
            )
            cls = grid_kernel.void_classification_mask(m_chan)
            return jnp.sum(cls[1]) + jnp.sum(cls[2]) + miss
        return jnp.sum(jax.lax.map(one, (positions, cells)))

    def time_it(name, fn, *a):
        t0 = time.time()
        v = float(np.asarray(fn(*a)))
        compile_t = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            v = float(np.asarray(fn(*a)))
            times.append(time.time() - t0)
        per = min(times) / k
        print(f"{name}: {per * 1e3:.2f} ms/frame "
              f"(compile {compile_t:.0f}s, chk {v:.4g})", file=sys.stderr)
        return per

    # mc points ride the void_masks call in production
    import jax.numpy as jnp2
    rng2 = np.random.default_rng(20240817)
    pts = rng2.random((bp.num_samples, 3)).astype(np.float32)
    pts_tiled, w_t = grid_kernel.assign_points_to_xytiles(pts, col_plan)
    pts_tiled = jnp.asarray(pts_tiled)
    w_t = jnp.asarray(w_t)

    @jax.jit
    def stage_a2(positions, cells):
        def one(args):
            pos, cell = args
            frac = frac_of(pos, cell)
            m_probe, m_chan, fit_pts, miss = grid_kernel.void_masks_columns(
                frac, cell, radii, grid, probe=probe, chan=chan,
                nbx=col_plan["nbx"], nby=col_plan["nby"],
                window=col_plan["window"], pts_tiled=pts_tiled,
            )
            return jnp.sum(m_chan) + jnp.sum(fit_pts) + miss
        return jnp.sum(jax.lax.map(one, (positions, cells)))

    @jax.jit
    def stage_s(positions, cells):
        def one(args):
            pos, cell = args
            frac = frac_of(pos, cell)
            m_probe, m_chan, fit_pts, miss = grid_kernel.void_masks_columns(
                frac, cell, radii, grid, probe=probe, chan=chan,
                nbx=col_plan["nbx"], nby=col_plan["nby"],
                window=col_plan["window"], pts_tiled=pts_tiled,
            )
            cls = grid_kernel.void_classification_mask(m_chan)
            _, accessible, pocket = cls[:3]
            acc_pt = grid_kernel.grid_lookup(accessible, pts_tiled, grid)
            av = jnp.sum((fit_pts & acc_pt) * w_t)
            dirs = grid_kernel.fibonacci_sphere(8)
            valid, i_pt, i_nu, gis, rs, miss_s = (
                grid_kernel.surface_valid_columns(
                    frac, cell, radii, probe, jnp.asarray(dirs), grid,
                    nbx=surf_plan["nbx"], nby=surf_plan["nby"],
                    window=surf_plan["window"], chunk=surf_plan["chunk"],
                    col_cap=surf_plan["col_cap"], cand_mask=m_chan,
                )
            )
            acc_c, nacc_c = grid_kernel.classify_surface_points(
                valid, i_pt, i_nu, accessible, pocket
            )
            return (jnp.sum(acc_c) + jnp.sum(nacc_c) + av
                    + (miss | miss_s))
        return jnp.sum(jax.lax.map(one, (positions, cells)))

    ta = time_it("A conn-masks", stage_a, positions, cells)
    ta2 = time_it("A2 +mc-pts", stage_a2, positions, cells)
    tb = time_it("B +floodfill", stage_b, positions, cells)
    ts = time_it("S full minus io", stage_s, positions, cells)

    # C: the production step (includes surface + MC + stacking)
    p_args = jax.device_put(args)
    t0 = time.time()
    out = step_fn(*p_args)
    _ = [float(np.asarray(v).sum()) for v in out[:4]]
    print(f"C compile+run {time.time() - t0:.0f}s", file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = step_fn(*p_args)
        _ = [float(np.asarray(v).sum()) for v in out[:4]]
        times.append(time.time() - t0)
    tc = min(times) / k
    print(f"C full pore: {tc * 1e3:.2f} ms/frame", file=sys.stderr)
    print(f"split: conn={ta*1e3:.1f} mc-ride={(ta2-ta)*1e3:.1f} "
          f"flood={(tb-ta)*1e3:.1f} "
          f"surf+classify={(ts-ta2-(tb-ta))*1e3:.1f} "
          f"io/step={(tc-ts)*1e3:.1f} ms/frame")


if __name__ == "__main__":
    main()
