"""Flood-fill variants on the porous ZIF-4 supercell mask (real TPU).

The porous stage split (scripts/profile_pore_stages.py --porous) puts
flood fill at 17.3 ms/frame vs 3.2 on dense glass: percolating
channels force the max-propagation fixpoint through hundreds of
rounds. Candidate fixes measured here, all against the SAME m_chan
masks and checked for bit-identical accessible/pocket outputs:

  V0 current     — two full fixpoints (open labels + seed propagation)
  V1 closure     — one fixpoint + component-graph closure over the
                   37k face-label pairs (scatter-max + gathers), the
                   accessible set is constant on open components so
                   this is exact
  V2 run-doubling — fixpoint whose rounds propagate whole open RUNS
                   per axis via masked distance-doubling (converges in
                   ~direction-changes rounds, not voxel-distance)
  V2c            — V2 flood + V1 closure combined

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_flood.py [--glass]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from amof_tpu.pore import grid_kernel
    from amof_tpu.pore.batch import BatchedPore
    from amof_tpu.parallel.mesh import analysis_mesh
    from amof_tpu.ops.pair_engine import matvec3
    from bench import make_porous_supercell, make_trajectory

    k = 16
    glass = "--glass" in sys.argv
    if glass:
        batch, box = make_trajectory(k, 10240)
        probe = chan = 1.2
    else:
        batch, n_atoms = make_porous_supercell(k)
        probe = chan = 1.0
    bp = BatchedPore(resolution=0.25, vol_method="mc", conn_resolution=0.5,
                     probe_radius=probe, chan_radius=chan)
    _, _, meta = bp.prepare(batch, mesh=analysis_mesh(n_frames=k))
    col_plan = meta["col_plan"]
    grid = col_plan["grid"]
    print(f"devices={jax.devices()} grid={grid}", file=sys.stderr)

    from amof_tpu.data import elements
    radii = jnp.asarray(
        elements.vdw_radius_array()[np.asarray(batch.species)]
        .astype(np.float32))
    positions = jax.device_put(np.asarray(batch.positions, np.float32))
    cells = jax.device_put(np.asarray(batch.cell, np.float32))

    def mask_of(pos, cell):
        f = matvec3(pos, jnp.linalg.inv(cell))
        f = f - jnp.floor(f)
        _, m_chan, _, _ = grid_kernel.void_masks_columns(
            f, cell, radii, grid, probe=probe, chan=chan,
            nbx=col_plan["nbx"], nby=col_plan["nby"],
            window=col_plan["window"])
        return m_chan

    # ---- variants -------------------------------------------------

    def v0(mask):
        _, acc, poc = grid_kernel.void_classification_mask(mask)
        return acc, poc

    def closure_from_open(open_labels, mask):
        """Accessible via component-graph closure (exact: accessibility
        is constant on open components; every periodic adjacency is a
        face pair)."""
        n = open_labels.size
        lab = open_labels.reshape(-1)
        ab = grid_kernel.face_label_pairs(open_labels)
        a, b = ab[0], ab[1]
        live = a >= 0  # face pair where BOTH sides are open
        live = live & (b >= 0)
        ia = jnp.where(live, a, n)
        ib = jnp.where(live, b, n)
        flag = jnp.zeros(n + 1, jnp.bool_)
        wins = live & (a == b)
        flag = flag.at[jnp.where(wins, a, n)].max(wins)

        def body(state):
            flag, _ = state
            on = (flag[ia] | flag[ib]) & live
            nf = flag.at[ia].max(on)
            nf = nf.at[ib].max(on)
            return nf, jnp.any(nf != flag)

        flag, _ = jax.lax.while_loop(
            lambda s: s[1], body, (flag, jnp.array(True)))
        acc = flag[jnp.where(lab >= 0, lab, n)].reshape(mask.shape) & mask
        return acc

    def v1(mask):
        open_labels = grid_kernel.label_components(mask, periodic=False)
        acc = closure_from_open(open_labels, mask)
        return acc, mask & ~acc

    def v2(mask):
        # aperiodic open labels via run-doubling flood. The run guard
        # 'can' is built on wallmask (mask with the LAST slice per axis
        # forced closed) so no doubling jump ever crosses the wrap —
        # exact aperiodic semantics with plain jnp.roll.
        gx, gy, gz = mask.shape
        init = jnp.where(
            mask,
            jnp.arange(gx * gy * gz, dtype=jnp.int32).reshape(mask.shape),
            -1)
        wallmask = mask
        for axis in range(3):
            sl = [slice(None)] * 3
            sl[axis] = -1
            wallmask = wallmask.at[tuple(sl)].set(False)

        def axis_runs(L, axis, g):
            can = wallmask
            d = 1
            while d < g:
                L = jnp.where(
                    can, jnp.maximum(L, jnp.roll(L, -d, axis)), L)
                Lb = jnp.roll(L, d, axis)
                L = jnp.where(jnp.roll(can, d, axis),
                              jnp.maximum(L, Lb), L)
                can = can & jnp.roll(can, -d, axis)
                d *= 2
            return jnp.where(mask, L, -1)

        def body(state):
            L, _ = state
            new = grid_kernel._neighbor_max(L, mask, False)
            for axis in range(3):
                new = axis_runs(new, axis, mask.shape[axis])
            return new, jnp.any(new != L)

        open_labels, _ = jax.lax.while_loop(
            lambda s: s[1], body, (init, jnp.array(True)))
        acc = closure_from_open(open_labels, mask)
        return acc, mask & ~acc

    # ---- harness ----------------------------------------------------

    masks = None

    @jax.jit
    def build_masks(positions, cells):
        return jax.lax.map(
            lambda a: mask_of(a[0], a[1]), (positions, cells))

    t0 = time.time()
    masks = jax.device_put(build_masks(positions, cells))
    jnp.asarray(masks).block_until_ready()
    print(f"masks built {time.time() - t0:.0f}s "
          f"fill={float(jnp.mean(masks)):.4f}", file=sys.stderr)

    def time_variant(name, fn):
        @jax.jit
        def run(masks):
            def one(m):
                acc, poc = fn(m)
                return jnp.sum(acc) + 2 * jnp.sum(poc)
            return jnp.sum(jax.lax.map(one, masks))

        t0 = time.time()
        chk = float(np.asarray(run(masks)))
        ct = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            chk = float(np.asarray(run(masks)))
            ts.append(time.time() - t0)
        per = min(ts) / k * 1e3
        print(f"{name}: {per:.2f} ms/frame (compile {ct:.0f}s, "
              f"chk {chk:.6g})")
        return per, chk

    def make_v3(ns, rd, alt=False, skip=False, tb=None, th=None):
        def v3(mask):
            gx, gy, gz = mask.shape
            init = jnp.where(
                mask,
                jnp.arange(gx * gy * gz, dtype=jnp.int32)
                .reshape(mask.shape), -1)
            open_labels = grid_kernel._propagate_fixpoint(
                init, False, 8, n_sweeps=ns, run_doubling=rd,
                alternate=alt, block_skip=skip, skip_tb=tb, skip_th=th)
            seeds = grid_kernel.winding_seeds(open_labels, mask)
            sinit = jnp.where(
                seeds, 1, jnp.where(mask, 0, -1)).astype(jnp.int32)
            acc = grid_kernel._propagate_fixpoint(
                sinit, True, 8, n_sweeps=ns, run_doubling=rd,
                alternate=alt, block_skip=skip, skip_tb=tb, skip_th=th
            ) == 1
            return acc, mask & ~acc
        return v3

    def v1c(mask):
        # one pallas fixpoint (aperiodic open labels) + component-graph
        # closure instead of the second (periodic seed) fixpoint
        gx, gy, gz = mask.shape
        init = jnp.where(
            mask,
            jnp.arange(gx * gy * gz, dtype=jnp.int32).reshape(mask.shape),
            -1)
        open_labels = grid_kernel._propagate_fixpoint(init, False, 8)
        acc = closure_from_open(open_labels, mask)
        return acc, mask & ~acc

    r0 = time_variant("V0 plain ns=8 rd=0", make_v3(8, 0))
    results = [r0]
    for tb, th, ns in ((16, 1, 4), (32, 1, 4), (24, 1, 4), (16, 1, 2),
                       (32, 1, 2)):
        results.append(time_variant(
            f"Vs skip tb={tb:2d} th={th} ns={ns:2d}",
            make_v3(ns, 0, skip=True, tb=tb, th=th)))
    results.append(time_variant("Vd default path   ", v0))
    for i, r in enumerate(results[1:], 1):
        if abs(r[1] - r0[1]) > 0.5:
            print(f"MISMATCH variant {i}: {r[1]} vs {r0[1]}")
    print("exactness checked vs V0")


if __name__ == "__main__":
    main()
