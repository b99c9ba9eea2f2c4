"""Bisect the surface_valid_columns cost on the glass bench workload.

Stages (each K-frame lax.map in one jit, scalar outputs):
  P0: candidate prefilter only (dilation + point voxel codes + gathers)
  P1: P0 + centers sort + blocker xycol sort + bounds
  P2: full surface_valid_columns (adds the batched chunk map)
  P3: P2 + classify_surface_points gathers
Differences isolate prefilter / sorts / map / classify.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amof_tpu.ops.pair_engine import matvec3
    from amof_tpu.pore import grid_kernel
    from amof_tpu.pore.batch import BatchedPore
    from amof_tpu.parallel.mesh import analysis_mesh
    from amof_tpu.data import elements
    sys.path.insert(0, "/root/repo")
    from bench import make_trajectory

    k = 16
    batch, box = make_trajectory(k, 10240)
    print(f"devices={jax.devices()}", file=sys.stderr)

    bp = BatchedPore(resolution=0.25, vol_method="mc",
                     conn_resolution=0.5)
    _, _, meta = bp.prepare(batch, mesh=analysis_mesh(n_frames=k))
    col_plan, surf_plan = meta["col_plan"], meta["surf_plan"]
    grid = col_plan["grid"]
    probe = 1.2
    rad_table = elements.vdw_radius_array()
    radii = jnp.asarray(
        rad_table[np.asarray(batch.species)].astype(np.float32)
    )
    dirs = jnp.asarray(grid_kernel.fibonacci_sphere(8))
    nbx, nby = surf_plan["nbx"], surf_plan["nby"]
    window, chunk = surf_plan["window"], surf_plan["chunk"]
    col_cap = surf_plan["col_cap"]

    positions = jax.device_put(np.asarray(batch.positions, np.float32))
    cells = jax.device_put(np.asarray(batch.cell, np.float32))

    def frac_of(pos, cell):
        f = matvec3(pos, jnp.linalg.inv(cell))
        return f - jnp.floor(f)

    def masks(pos, cell):
        frac = frac_of(pos, cell)
        m_probe, m_chan, _, miss = grid_kernel.void_masks_columns(
            frac, cell, radii, grid, probe=probe, chan=probe,
            nbx=col_plan["nbx"], nby=col_plan["nby"],
            window=col_plan["window"],
        )
        return frac, m_chan, miss

    def surface_partial(frac_atoms, cell, cand_mask, upto):
        """Truncated re-trace of surface_valid_columns internals."""
        n = frac_atoms.shape[0]
        inv_cell = jnp.linalg.inv(cell)
        n_cols = nbx * nby
        stride = nby + 2
        gvec = jnp.array(grid)
        fx = frac_atoms[:, 0] - jnp.floor(frac_atoms[:, 0])
        fy = frac_atoms[:, 1] - jnp.floor(frac_atoms[:, 1])
        fz = frac_atoms[:, 2] - jnp.floor(frac_atoms[:, 2])
        bx = jnp.minimum((fx * nbx).astype(jnp.int32), nbx - 1)
        by = jnp.minimum((fy * nby).astype(jnp.int32), nby - 1)
        gidx = jnp.arange(n, dtype=jnp.float32)
        kd = dirs.shape[0]

        md = cand_mask
        for ax in range(3):
            md = md | jnp.roll(md, 1, ax) | jnp.roll(md, -1, ax)
        code = cand_mask.astype(jnp.int8) | (md.astype(jnp.int8) << 1)
        cflat = code.reshape(-1)
        fo = matvec3(dirs, inv_cell)
        nshift = matvec3(dirs * jnp.float32(0.2), inv_cell)
        fbase = jnp.stack([fx, fy, fz], axis=1)
        fp_all = (
            fbase[:, None, :]
            + (radii[:, None, None] + probe) * fo[None]
        )

        def lin_bnd(f):
            f = f - jnp.floor(f)
            fg = f * gvec
            idx = jnp.minimum(fg.astype(jnp.int32), gvec - 1)
            lin = (idx[..., 0] * grid[1] + idx[..., 1]) * grid[2] \
                + idx[..., 2]
            near = jnp.any(
                jnp.abs(fg - jnp.round(fg)) < jnp.float32(5e-4), axis=-1
            )
            return lin, near

        l1, nb1 = lin_bnd(fp_all)
        l2, nb2 = lin_bnd(fp_all + nshift[None])
        c1 = cflat[l1.reshape(-1)].reshape(n, kd)
        c2 = cflat[l2.reshape(-1)].reshape(n, kd)
        cand_pt = (
            ((c1 & 1) | (c2 & 1)).astype(bool)
            | (nb1 & (c1 >= 2)) | (nb2 & (c2 >= 2))
        )
        cand = cand_pt.any(axis=1)
        if upto == 0:
            return jnp.sum(cand)

        key_c = (bx * nby + by).astype(jnp.float32) + jnp.where(
            cand, fz * 0.5, 0.5 + fz * 0.5
        )
        keys_c, cx, cy, cz, cr, cg, ccand = jax.lax.sort(
            (key_c, fx, fy, fz, radii, gidx, cand.astype(jnp.float32)),
            dimension=0, num_keys=1,
        )
        c_bounds = jnp.searchsorted(
            keys_c, jnp.arange(n_cols + 1, dtype=jnp.float32)
        )
        keys_b, blockers_pl = grid_kernel._sort_atoms_xycols(
            frac_atoms, [radii, gidx], nbx, nby
        )
        cstarts_b = jnp.searchsorted(
            keys_b, jnp.arange(nbx * stride + 1, dtype=jnp.float32)
        )
        return (jnp.sum(cx) + jnp.sum(c_bounds) + jnp.sum(blockers_pl)
                + jnp.sum(cstarts_b))

    def make_stage(upto):
        @jax.jit
        def fn(positions, cells):
            def one(args):
                pos, cell = args
                frac, m_chan, miss = masks(pos, cell)
                return surface_partial(frac, cell, m_chan, upto) + miss
            return jnp.sum(jax.lax.map(one, (positions, cells)))
        return fn

    @jax.jit
    def full(positions, cells):
        def one(args):
            pos, cell = args
            frac, m_chan, miss = masks(pos, cell)
            valid, i_pt, i_nu, gis, rs, miss_s = (
                grid_kernel.surface_valid_columns(
                    frac, cell, radii, probe, dirs, grid,
                    nbx=nbx, nby=nby, window=window, chunk=chunk,
                    col_cap=col_cap, cand_mask=m_chan,
                )
            )
            return jnp.sum(valid) + jnp.sum(gis) + miss
        return jnp.sum(jax.lax.map(one, (positions, cells)))

    @jax.jit
    def base(positions, cells):
        def one(args):
            pos, cell = args
            frac, m_chan, miss = masks(pos, cell)
            return jnp.sum(m_chan) + miss
        return jnp.sum(jax.lax.map(one, (positions, cells)))

    def time_it(name, fn):
        t0 = time.time()
        v = float(np.asarray(fn(positions, cells)))
        ct = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(np.asarray(fn(positions, cells)))
            ts.append(time.time() - t0)
        per = min(ts) / k
        print(f"{name}: {per * 1e3:.2f} ms/frame (compile {ct:.0f}s "
              f"chk {v:.4g})", file=sys.stderr)
        return per

    t_base = time_it("base (conn masks)", base)

    def make_full(chunk_v, c_batch_v):
        cap_v = int(-(-col_cap // chunk_v) * chunk_v)

        @jax.jit
        def fn(positions, cells):
            def one(args):
                pos, cell = args
                frac, m_chan, miss = masks(pos, cell)
                valid, i_pt, i_nu, gis, rs, miss_s = (
                    grid_kernel.surface_valid_columns(
                        frac, cell, radii, probe, dirs, grid,
                        nbx=nbx, nby=nby, window=window, chunk=chunk_v,
                        col_cap=cap_v, cand_mask=m_chan,
                        c_batch=c_batch_v,
                    )
                )
                return jnp.sum(valid) + jnp.sum(gis) + miss
            return jnp.sum(jax.lax.map(one, (positions, cells)))
        return fn

    for chunk_v, c_batch_v in [(32, 8), (32, 16), (64, 8), (64, 16),
                               (32, 32), (128, 8)]:
        t = time_it(f"surface chunk={chunk_v} c_batch={c_batch_v}",
                    make_full(chunk_v, c_batch_v))
        print(f"  -> map-only {(t - t_base) * 1e3:.2f} ms/frame",
              file=sys.stderr)


if __name__ == "__main__":
    main()
