"""Hardware verification of the quadrant-packed blocked RDF kernel.

Runs pallas_rdf_counts_blocked at p=1 (the current production default)
and p=2 (what p='auto' resolves to at bench shapes) on a real TPU:
  1. bit-exactness: counts must match p=1 exactly (integer histograms);
  2. throughput: lax.map over K frames inside one jit, scalar reduced
     (CLAUDE.md timing discipline: 25 ms dispatch overhead, 10 MB/s
     device->host — never transfer grids).

Usage: python scripts/verify_packed_rdf.py [--atoms 10240] [--k 16]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=10240)
    ap.add_argument("--k", type=int, default=16, help="frames per jit")
    ap.add_argument("--dr", type=float, default=0.02)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from amof_tpu.ops import pallas_rdf

    print(f"devices={jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    n_atoms = args.atoms
    counts_by_z = {
        30: n_atoms // 17,
        7: 4 * (n_atoms // 17),
        6: 6 * (n_atoms // 17),
    }
    counts_by_z[1] = n_atoms - sum(counts_by_z.values())
    species_z = np.concatenate(
        [np.full(c, z, np.int64) for z, c in counts_by_z.items()]
    )
    # species indices 0..S-1 like the fused pipeline uses
    uniq = np.unique(species_z)
    sp_idx = np.searchsorted(uniq, species_z).astype(np.int32)
    n_species = len(uniq)
    box = (n_atoms / 0.062) ** (1 / 3)
    rmax = box / 2
    bins = int(rmax // args.dr)
    print(f"atoms={n_atoms} S={n_species} bins={bins}", file=sys.stderr)

    perm, sp_l = pallas_rdf.species_block_layout(sp_idx, block=256)
    pos = rng.uniform(0, box, (args.k, n_atoms, 3)).astype(np.float32)
    pos_l = pallas_rdf.apply_atom_layout(pos, perm)
    cell = np.eye(3, dtype=np.float32) * box

    n_pad = len(sp_l)
    sp_l_j = jnp.asarray(sp_l)
    cell_j = jnp.asarray(cell)
    pos_j = jax.device_put(jnp.asarray(pos_l))

    import functools

    @functools.partial(jax.jit, static_argnames=("p",))
    def run(pos_batch, p):
        def one(x):
            return pallas_rdf.pallas_rdf_counts_blocked(
                x, cell_j, sp_l_j, args.dr, n_species, bins,
                ti=256, tj=256, g=64, p=p,
            )
        h = jax.lax.map(one, pos_batch)
        return h.sum(0), jnp.abs(h).sum()

    results = {}
    for p in (1, 2, 4):
        try:
            t0 = time.time()
            total, chk = run(pos_j, p)
            chk_v = float(np.asarray(chk))
            t_compile = time.time() - t0
            times = []
            for _ in range(args.repeats):
                t0 = time.time()
                _, chk = run(pos_j, p)
                float(np.asarray(chk))  # force transfer (scalar)
                times.append(time.time() - t0)
            per_frame = min(times) / args.k
            results[p] = (np.asarray(total), chk_v, per_frame)
            print(
                f"p={p}: compile+run {t_compile:.1f}s, "
                f"{per_frame * 1e3:.2f} ms/frame, checksum {chk_v:.6e}",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"p={p}: FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)

    if 1 in results and 2 in results:
        same = np.array_equal(results[1][0], results[2][0])
        print(f"p=2 bit-exact vs p=1: {same}", file=sys.stderr)
        if not same:
            d = np.abs(results[1][0] - results[2][0])
            print(f"  max abs diff {d.max()} at {np.unravel_index(d.argmax(), d.shape)}",
                  file=sys.stderr)
    if 1 in results and 4 in results:
        same = np.array_equal(results[1][0], results[4][0])
        print(f"p=4 bit-exact vs p=1: {same}", file=sys.stderr)
    print("OK" if all(
        np.array_equal(results[1][0], results[p][0])
        for p in results if p != 1
    ) else "MISMATCH")


if __name__ == "__main__":
    main()
