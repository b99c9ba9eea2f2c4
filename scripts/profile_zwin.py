"""A/B the z-chunked vs full-run xy-column mask kernel on the real TPU.

Times void_masks_columns (the connectivity-mask term of the batched
pore path) at bench shapes, lax.map'd over K frames inside one jit
with a scalar-reduced output (CLAUDE.md timing discipline).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_zwin.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")  # before any amof_tpu/bench import


def main():
    import jax
    import jax.numpy as jnp

    from amof_tpu.pore import grid_kernel
    from bench import make_trajectory

    k = 16
    batch, box = make_trajectory(k, 10240)
    print(f"devices={jax.devices()} box={box:.2f}", file=sys.stderr)

    from amof_tpu.data import elements
    rad_table = elements.vdw_radius_array()
    radii = jnp.asarray(
        rad_table[np.asarray(batch.species)].astype(np.float32)
    )
    probe = chan = 1.2
    cells = np.asarray(batch.cell, np.float64)
    grid_raw = tuple(
        int(-(-box // 0.5)) for _ in range(3)
    )
    plan = grid_kernel.xycol_plan(
        cells, float(np.asarray(radii).max()), probe + 1e-3, grid_raw,
        10240,
    )
    grid_kernel.calibrate_z_windows(
        np.asarray(batch.positions), cells, plan
    )
    print(f"plan={plan}", file=sys.stderr)
    grid = plan["grid"]

    positions = jax.device_put(np.asarray(batch.positions, np.float32))
    cells_j = jax.device_put(np.asarray(batch.cell, np.float32))

    from amof_tpu.ops.pair_engine import matvec3

    def frac_of(pos, cell):
        f = matvec3(pos, jnp.linalg.inv(cell))
        return f - jnp.floor(f)

    def make_stage(zkw):
        @jax.jit
        def stage(positions, cells):
            def one(args):
                pos, cell = args
                frac = frac_of(pos, cell)
                m_probe, m_chan, _, miss = grid_kernel.void_masks_columns(
                    frac, cell, radii, grid, probe=probe, chan=chan,
                    nbx=plan["nbx"], nby=plan["nby"],
                    window=plan["window"], **zkw,
                )
                return jnp.sum(m_chan) + 1000000 * miss
            return jnp.sum(jax.lax.map(one, (positions, cells)))
        return stage

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
              f"(compile {compile_t:.0f}s, chk {v:.6g})", file=sys.stderr)
        return per, v

    base = make_stage({})
    zwin = make_stage(dict(
        n_zc=plan["n_zc"], wz=plan["wz"], wzw=plan["wzw"],
        zmargin=plan["zmargin"],
    ))
    pb, vb = time_it("mask full-run", base, positions, cells_j)
    pz, vz = time_it("mask z-window", zwin, positions, cells_j)
    assert vb == vz, f"checksum mismatch: {vb} vs {vz}"
    print(f"speedup {pb / pz:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
