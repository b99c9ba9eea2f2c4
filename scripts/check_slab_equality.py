"""Exact-equality check: slab-table BAD vs 1-level window vs full table
at bench shapes (10240-atom glass) on the current backend.

Compares conc/center_any histograms and the overflow flag for one frame
at max_neighbors in {8, 16}.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_slab_equality.py
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amof_tpu.ops import bad_kernel, pair_engine, pallas_rdf
    from amof_tpu.ops import slab_table
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
    dtheta = 0.05
    bad_bins = int(180 // dtheta) + 1

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
    est = 1.6 * n_pad * 2.0 * rc_max / box + 64
    window = int(-(-est // 128) * 128)
    plan = slab_table.slab_plan(
        np.asarray(batch.cell), rc_max, n_pad
    )
    print(f"n_pad={n_pad} window={window} plan={plan}", file=sys.stderr)

    sp_j = jnp.asarray(sp_l)
    cm_j = jnp.asarray(cutoff_matrix)
    pos0 = jnp.asarray(pos_l[0])
    cell0 = jnp.asarray(np.asarray(batch.cell, np.float32)[0])

    on_tpu = jax.default_backend() != "cpu"
    impl = "pallas" if on_tpu else "xla"
    for k_cap in (8, 16):
        outs = {}
        for name, kw in [
            ("full", dict(window=None, table_impl="xla")),
            ("win", dict(window=window, table_impl=impl)),
            ("slab", dict(window=window, slab=plan, table_impl=impl)),
        ]:
            c, a, ovf = bad_kernel.frame_bad_counts(
                pos0, cell0, sp_j, cm_j, n_species, dtheta, bad_bins,
                k_cap, 256, **kw,
            )
            outs[name] = (np.asarray(c), np.asarray(a), bool(ovf))
            print(f"k={k_cap} {name}: sum_c={outs[name][0].sum():.1f} "
                  f"sum_a={outs[name][1].sum():.1f} ovf={outs[name][2]}",
                  file=sys.stderr)
        for name in ("win", "slab"):
            c_eq = np.array_equal(outs[name][0], outs["full"][0])
            a_eq = np.array_equal(outs[name][1], outs["full"][1])
            print(f"k={k_cap} {name} vs full: conc_equal={c_eq} "
                  f"any_equal={a_eq}", file=sys.stderr)
            if not (c_eq and a_eq) and not outs[name][2]:
                print(f"MISMATCH WITHOUT OVERFLOW: {name} k={k_cap}")
                sys.exit(1)
    print("OK: all unflagged paths bit-exact vs the full table")


if __name__ == "__main__":
    main()
