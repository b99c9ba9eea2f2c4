"""Is the 100-400 s warm-start cost a one-time first-Pallas-program
tax, or specific to the glass RDF kernel?

Runs, in one fresh process: (1) a trivial Pallas copy kernel, (2) a
trivial Pallas int8 MXU dot kernel, (3) the production glass-shape
blocked RDF kernel, timing the first execution of each. If (1) absorbs
the 100-400 s, the cost is per-process Mosaic/runtime init and a cheap
warmup kernel can pay it early (overlapped with host-side prepare);
if (3) is still slow, the cost is kernel-specific compile time.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def t(tag, fn):
    t0 = time.time()
    out = fn()
    np.asarray(out)  # full sync through the tunnel
    print(f"probe {tag}: {time.time() - t0:.1f}s", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from bench import init_devices, make_trajectory

    init_devices()
    print(f"probe: devices={jax.devices()}", flush=True)

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    x = jnp.ones((8, 128), jnp.float32)
    t("pallas-copy  ", lambda: pl.pallas_call(
        copy_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x))

    def dot_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    a = jnp.ones((32, 128), jnp.int8)
    b = jnp.ones((128, 128), jnp.int8)
    t("pallas-i8dot ", lambda: pl.pallas_call(
        dot_kernel, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32)
    )(a, b))

    # production glass-shape RDF kernel, one frame
    from amof_tpu.ops import pallas_rdf
    from amof_tpu.ops.pair_engine import frame_rdf_counts

    batch, box = make_trajectory(1, 10240)
    z_to_idx = {30: 0, 7: 1, 6: 2, 1: 3}
    sp = np.array([z_to_idx[z] for z in np.asarray(batch.species)], np.int32)
    perm, sp_l = pallas_rdf.species_block_layout(sp, block=256,
                                                 total_multiple=256)
    pos = pallas_rdf.apply_atom_layout(np.asarray(batch.positions), perm)
    bins = int((box / 2) // 0.01)
    print(f"probe: n={len(sp_l)} bins={bins}", flush=True)
    cell = jnp.asarray(batch.cell[0])
    posj = jnp.asarray(pos[0])
    spj = jnp.asarray(sp_l)
    t("rdf-blocked  ", lambda: pallas_rdf.pallas_rdf_counts_blocked(
        posj, cell, spj, 0.01, 4, bins, ti=256, tj=256, g=64))
    t("rdf-blocked-2", lambda: pallas_rdf.pallas_rdf_counts_blocked(
        posj, cell, spj, 0.01, 4, bins, ti=256, tj=256, g=64))


if __name__ == "__main__":
    main()
