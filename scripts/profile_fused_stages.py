"""Per-component timing of the fused pipeline's per-frame work on TPU.

Measures, at bench shapes (10240-atom glass in species-block layout,
dr=0.02, dtheta=0.05, cutoffs like bench.py), each component alone as
a K-frame lax.map inside one jit with scalar-reduced outputs:
  R. packed blocked RDF kernel (method='pallas-blocked')
  C. frame_cn_counts (full tiled pass, the no-bad path)
  B. BAD counts via the sorted-window table (emit_cn=True, the fused
     path) — includes the table build + angle histograms
  RB. R+B together in one per-frame fn (checks XLA co-scheduling)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fused_stages.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amof_tpu.ops import bad_kernel, pair_engine, pallas_rdf
    sys.path.insert(0, "/root/repo")
    from bench import make_trajectory

    porous = "--porous" in sys.argv
    if porous:
        from bench import make_porous_supercell

        k = 16
        made = make_porous_supercell(k)
        if made is None:
            sys.exit("porous supercell unavailable (ZIF-4 fixture "
                     "missing); rerun without --porous")
        batch, n_atoms = made
        box = float(batch.cell[0, 0, 0])
        print(f"porous supercell atoms={n_atoms}", file=sys.stderr)
    else:
        k = 32
        batch, box = make_trajectory(k, 10240)
    print(f"devices={jax.devices()} box={box:.2f}", file=sys.stderr)

    species = np.asarray(batch.species)
    uniq = np.unique(species)
    z_to_idx = np.zeros(species.max() + 1, np.int32)
    for i, z in enumerate(uniq):
        z_to_idx[z] = i
    sp_idx = z_to_idx[species]
    n_species = len(uniq)
    dr, dtheta = (0.01 if '--dr001' in sys.argv else 0.02), 0.05
    rmax = box / 2
    bins = int(rmax // dr)
    bad_bins = int(180 // dtheta) + 1

    # same cutoffs as bench.py
    cut = {"Zn-N": 2.0, "C-C": 1.75, "C-N": 1.73, "C-H": 1.3}
    sym_to_idx = {30: "Zn", 7: "N", 6: "C", 1: "H"}
    cutoff_matrix = np.zeros((n_species, n_species), np.float32)
    from amof_tpu.data import elements
    sym_of = {z: elements.symbol_of(z) for z in uniq}
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
    print(f"atoms={len(species)} padded={n_pad} bins={bins} "
          f"bad_bins={bad_bins}", file=sys.stderr)

    # fused-path window estimate (pipeline.prepare logic)
    rc_max = float(cutoff_matrix.max())
    est = 1.6 * n_pad * 2.0 * rc_max / box + 64
    window = int(-(-est // 128) * 128)
    print(f"bad_window={window}", file=sys.stderr)

    sp_j = jnp.asarray(sp_l)
    cm_j = jnp.asarray(cutoff_matrix)
    cells = jax.device_put(np.asarray(batch.cell, np.float32))
    pos_j = jax.device_put(jnp.asarray(pos_l))

    @jax.jit
    def run_rdf(pos_batch, cells):
        def one(args):
            pos, cell = args
            h = pair_engine.frame_rdf_counts(
                pos, cell, sp_j, dr, n_species, bins,
                method="pallas-blocked",
            )
            return jnp.sum(h)
        return jnp.sum(jax.lax.map(one, (pos_batch, cells)))

    @jax.jit
    def run_cn(pos_batch, cells):
        def one(args):
            pos, cell = args
            cn = pair_engine.frame_cn_counts(
                pos, cell, sp_j, cm_j, n_species, chunk=256,
            )
            return jnp.sum(cn)
        return jnp.sum(jax.lax.map(one, (pos_batch, cells)))

    def bad_one(args, slab=None):
        pos, cell = args
        bad_c, bad_a, ovf, cn = bad_kernel.frame_bad_counts(
            pos, cell, sp_j, cm_j, n_species, dtheta, bad_bins,
            max_neighbors=8, chunk=256, window=window,
            emit_cn=True, table_impl="pallas", slab=slab,
        )
        return jnp.sum(bad_c) + jnp.sum(bad_a) + jnp.sum(cn) + ovf

    @jax.jit
    def run_bad(pos_batch, cells):
        return jnp.sum(jax.lax.map(bad_one, (pos_batch, cells)))

    from amof_tpu.ops import slab_table
    plan = slab_table.slab_plan(
        np.asarray(batch.cell), float(cutoff_matrix.max()), n_pad
    )
    print(f"slab plan: {plan}", file=sys.stderr)

    @jax.jit
    def run_bad_slab(pos_batch, cells):
        import functools as ft
        return jnp.sum(jax.lax.map(
            ft.partial(bad_one, slab=plan), (pos_batch, cells)
        ))

    @jax.jit
    def run_rdf_bad(pos_batch, cells):
        def one(args):
            pos, cell = args
            h = pair_engine.frame_rdf_counts(
                pos, cell, sp_j, dr, n_species, bins,
                method="pallas-blocked",
            )
            return jnp.sum(h) + bad_one(args)
        return jnp.sum(jax.lax.map(one, (pos_batch, cells)))

    def time_it(name, fn):
        t0 = time.time()
        v = float(np.asarray(fn(pos_j, cells)))
        ct = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            float(np.asarray(fn(pos_j, cells)))
            times.append(time.time() - t0)
        per = min(times) / k
        print(f"{name}: {per * 1e3:.2f} ms/frame (compile {ct:.0f}s, "
              f"chk {v:.4g})", file=sys.stderr)
        return per

    tr = time_it("R rdf-packed", run_rdf)
    tc = time_it("C cn-full", run_cn)
    tb = time_it("B bad-table", run_bad)
    tb2 = time_it("B2 bad-slab", run_bad_slab) if plan else float("nan")
    trb = time_it("RB rdf+bad", run_rdf_bad)
    print(f"split: rdf={tr*1e3:.1f} cn_full={tc*1e3:.1f} "
          f"bad={tb*1e3:.1f} bad_slab={tb2*1e3:.1f} "
          f"rdf+bad={trb*1e3:.1f} "
          f"(co-schedule gain {(tr+tb-trb)*1e3:.1f})")


if __name__ == "__main__":
    main()
