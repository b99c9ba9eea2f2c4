"""Probe: RDF histogram kernel decompositions (round-5 verdict #2).

The production species-blocked kernel (ops/pallas_rdf.py) measures
9.4 ms/frame vs a ~4.4 ms combined MXU+VPU bound at 52M pairs. Model:
it is VPU-bound on per-pair one-hot COMPARES (hi2 + 128/p ~ 80 lanes of
int32-width compares) plus an extra [p*hi2 + 128, K] concat pass. The
variants here attack exactly those terms:

  base    production pallas_rdf_counts_blocked (p=auto)
  nocat   band-offset 3D compare [p, hi2, K] reshaped to [p*hi2, K]
          (no concatenate materialization pass)
  i8      nocat + compares at int8 width (keys < 128 fit i8; Mosaic
          packs 4 i8 lanes per i32 lane)
  bf16    nocat + compares at bf16 width (2x packing; integers exact)
  ortho   i8 + orthogonal-cell minimum image (diag cell: 3 ops/axis
          instead of the 30-op triclinic wrap)

Each variant is asserted bit-equal to the baseline before timing.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python
    scripts/probe_rdf_variants.py [--frames 16] [--atoms 10240]
CPU check:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=...
    python scripts/probe_rdf_variants.py --interpret --atoms 1024 --frames 2
"""

import argparse
import functools
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument("--atoms", type=int, default=10240)
    parser.add_argument("--dr", type=float, default=0.01)
    parser.add_argument("--interpret", action="store_true")
    parser.add_argument("--variants", type=str,
                        default="base,nocat,i8,bf16,ortho")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from amof_tpu.ops import pallas_rdf
    from amof_tpu.ops.pallas_rdf import (
        LO, WRAP_EPS, _band_rows, resolve_packing, species_block_layout,
        apply_atom_layout,
    )

    # ---------------- variant kernel ----------------

    def _kernel_v2(scalars, atoms_i_ref, atoms_j_ref, out_ref, acc_ref,
                   kh_ref, kl_ref, *, n_species, bins, ti, tj, hi2,
                   n_atoms, g, p, cmp_dtype, ortho, mode="full"):
        i_t = pl.program_id(0)
        j_t = pl.program_id(1)

        @pl.when(jnp.logical_and(i_t == 0, j_t == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(
            ((j_t + 1) * tj > i_t * ti)
            & (atoms_i_ref[0, 3] >= 0)
            & (atoms_j_ref[3, 0] >= 0)
        )
        def _compute():
            xi = atoms_i_ref[:, 0:3]
            si = atoms_i_ref[:, 3:4]
            xj = atoms_j_ref[0:3, :]
            sj = atoms_j_ref[3:4, :]
            dx = xj[0:1, :] - xi[:, 0:1]
            dy = xj[1:2, :] - xi[:, 1:2]
            dz = xj[2:3, :] - xi[:, 2:3]
            inv = [scalars[k] for k in range(9)]
            cel = [scalars[9 + k] for k in range(9)]
            inv_dr = scalars[18]
            if ortho:
                # diagonal cell: drop the cross terms of both 3x3
                # transforms; per-axis ops identical to the triclinic
                # path with zero off-diagonals, so bit-equal to it
                fx = dx * inv[0]
                fy = dy * inv[4]
                fz = dz * inv[8]
                fx = fx - jnp.floor(fx + (0.5 + WRAP_EPS))
                fy = fy - jnp.floor(fy + (0.5 + WRAP_EPS))
                fz = fz - jnp.floor(fz + (0.5 + WRAP_EPS))
                wx = fx * cel[0]
                wy = fy * cel[4]
                wz = fz * cel[8]
            else:
                fx = dx * inv[0] + dy * inv[3] + dz * inv[6]
                fy = dx * inv[1] + dy * inv[4] + dz * inv[7]
                fz = dx * inv[2] + dy * inv[5] + dz * inv[8]
                fx = fx - jnp.floor(fx + (0.5 + WRAP_EPS))
                fy = fy - jnp.floor(fy + (0.5 + WRAP_EPS))
                fz = fz - jnp.floor(fz + (0.5 + WRAP_EPS))
                wx = fx * cel[0] + fy * cel[3] + fz * cel[6]
                wy = fx * cel[1] + fy * cel[4] + fz * cel[7]
                wz = fx * cel[2] + fy * cel[5] + fz * cel[8]
            d = jnp.sqrt(wx * wx + wy * wy + wz * wz)
            b = jnp.floor(d * inv_dr).astype(jnp.int32)

            gi = i_t * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
            gj = j_t * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
            if mode == "distonly":
                # cost split diagnostic: distance + key, NO histogram
                acc_ref[:] = jnp.broadcast_to(
                    jnp.sum(b).reshape(1, 1), acc_ref.shape
                )
                out_ref[pl.ds(0, 1)] += acc_ref[:].astype(jnp.float32)[None]
                return
            if mode == "histonly":
                # cost split diagnostic: cheap synthetic key, full
                # histogram machinery, NO distance pass
                b = jnp.bitwise_and(gi * 7 + gj * 13, 2047)
                b = jnp.minimum(b, bins - 1)
            valid = (
                (gi < gj) & (si >= 0) & (sj >= 0) & (b < bins)
                & (gj < n_atoms)
            )
            loq = LO // p
            lo_bits = loq.bit_length() - 1
            key = jnp.where(valid, b, hi2 * loq - 1)
            kh_ref[:] = jnp.right_shift(key, lo_bits)
            kl_ref[:] = jnp.bitwise_and(key, loq - 1)

            iota_h = jax.lax.broadcasted_iota(
                jnp.int32, (1, hi2, 1), 1).astype(cmp_dtype)
            iota_l = jax.lax.broadcasted_iota(
                jnp.int32, (1, loq, 1), 1).astype(cmp_dtype)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            gq = g // p
            K = gq * tj

            def row_body(r, _):
                # [p, K] stream keys, one row per stream, no concat of
                # the big one-hots
                kh3 = kh_ref[pl.ds(r * g, g), :].reshape(p, 1, K)
                kl3 = kl_ref[pl.ds(r * g, g), :].reshape(p, 1, K)
                oh_h = (kh3.astype(cmp_dtype) == iota_h).astype(jnp.int8)
                oh_l = (kl3.astype(cmp_dtype) == iota_l).astype(jnp.int8)
                acc_ref[:] += jax.lax.dot_general(
                    oh_h.reshape(p * hi2, K), oh_l.reshape(p * loq, K),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return 0

            jax.lax.fori_loop(0, ti // g, row_body, 0)
            sa = jnp.maximum(si[0, 0].astype(jnp.int32), 0)
            sb = jnp.maximum(sj[0, 0].astype(jnp.int32), 0)
            pair_id = sa * n_species + sb
            out_ref[pl.ds(pair_id, 1)] += acc_ref[:].astype(jnp.float32)[None]

    @functools.partial(
        jax.jit,
        static_argnames=("n_species", "bins", "ti", "tj", "g", "p",
                         "cmp", "ortho", "mode", "interpret"),
    )
    def rdf_v2(positions, cell, species_idx, dr, n_species, bins,
               ti=256, tj=512, g=32, p=None, cmp="i32", ortho=False,
               mode="full", interpret=False):
        n = positions.shape[0]
        if p is None:
            p = resolve_packing(bins, g, n_species, ti, tj)
        hi2 = _band_rows(bins, p)
        cmp_dtype = {"i32": jnp.int32, "i8": jnp.int8,
                     "bf16": jnp.bfloat16, "f32": jnp.float32}[cmp]
        sp_f = species_idx.astype(jnp.float32)
        atoms_i = jnp.concatenate(
            [positions, sp_f[:, None], jnp.zeros((n, 4), jnp.float32)],
            axis=1)
        atoms_j = atoms_i.T.reshape(8, n)
        inv_cell = jnp.linalg.inv(cell)
        scalars = jnp.concatenate(
            [inv_cell.reshape(-1), cell.reshape(-1),
             jnp.array([1.0 / dr], cell.dtype)]).astype(jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-n // ti), -(-n // tj)),
            in_specs=[
                pl.BlockSpec((ti, 8), lambda i, j, s: (i, 0)),
                pl.BlockSpec((8, tj), lambda i, j, s: (0, j)),
            ],
            out_specs=pl.BlockSpec(
                (n_species * n_species, p * hi2, LO),
                lambda i, j, s: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((p * hi2, LO), jnp.int32),
                pltpu.VMEM((ti, tj), jnp.int32),
                pltpu.VMEM((ti, tj), jnp.int32),
            ],
        )
        kernel = functools.partial(
            _kernel_v2, n_species=n_species, bins=bins, ti=ti, tj=tj,
            hi2=hi2, n_atoms=n, g=g, p=p, cmp_dtype=cmp_dtype,
            ortho=ortho, mode=mode)
        counts = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_species * n_species, p * hi2, LO), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(scalars, atoms_i, atoms_j)
        s2 = n_species * n_species
        loq = LO // p
        diag = counts.reshape(s2, p, hi2, p, loq)
        half = sum(diag[:, q, :, q, :] for q in range(p))
        half = half.reshape(s2, hi2 * loq)[:, :bins]
        half = half.reshape(n_species, n_species, bins)
        return half + half.transpose(1, 0, 2)

    # ---------------- workload ----------------

    rng = np.random.default_rng(0)
    n_atoms = args.atoms
    counts = {30: n_atoms // 17, 7: 4 * (n_atoms // 17),
              6: 6 * (n_atoms // 17)}
    counts[1] = n_atoms - sum(counts.values())
    species_z = np.concatenate(
        [np.full(c, z, np.int64) for z, c in counts.items()])
    box = (n_atoms / 0.062) ** (1 / 3)
    pos = rng.uniform(0, box, (args.frames, n_atoms, 3)).astype(np.float32)
    cell = np.eye(3, dtype=np.float32) * box
    uniq = {z: i for i, z in enumerate(sorted(set(species_z)))}
    sp_idx = np.array([uniq[z] for z in species_z], np.int32)
    n_sp = len(uniq)
    bins = int((box / 2) // args.dr)
    perm, sp_blocked = species_block_layout(sp_idx, block=1024)
    posb = apply_atom_layout(pos, perm)
    print(f"devices={jax.devices()} atoms={n_atoms} (padded "
          f"{len(sp_blocked)}) bins={bins} frames={args.frames}",
          file=sys.stderr)

    cell_j = jnp.asarray(cell)
    spb_j = jnp.asarray(sp_blocked)
    posb_j = jnp.asarray(posb)

    def time_variant(name, frame_fn):
        fn = jax.jit(lambda ps: jax.lax.map(frame_fn, ps))
        t0 = time.time()
        out = np.asarray(fn(posb_j)).sum(axis=0)
        print(f"{name}: compile+run {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = fn(posb_j)
            s = float(np.asarray(jnp.sum(r)))  # scalar transfer barrier
            ts.append(time.time() - t0)
        ms = min(ts) / args.frames * 1e3
        print(f"{name}: {ms:.2f} ms/frame (chk={s:.6g})", flush=True)
        return out, ms

    variants = args.variants.split(",")
    results = {}
    base_out = None
    if "base" in variants:
        base_out, _ = results.setdefault("base", time_variant(
            "base", lambda ps: pallas_rdf.pallas_rdf_counts_blocked(
                ps, cell_j, spb_j, args.dr, n_sp, bins,
                interpret=args.interpret)))

    def check(name, out):
        if base_out is not None:
            np.testing.assert_array_equal(
                out, base_out, err_msg=f"{name} != base")
            print(f"{name}: bit-equal to base", flush=True)

    spec = {
        # NOTE (v5e, 2026-08-20): cmp="i8" AND cmp="bf16" are REJECTED
        # by Mosaic — "Target does not support this comparison" on
        # vector<8x128x4xi8> / bf16 eq — this target compares only at
        # 32-bit vector width, so the one-hot build cannot be packed
        # below one 32-bit lane per compare.
        "nocat": dict(cmp="i32", ortho=False),
        "i8": dict(cmp="i8", ortho=False),
        "bf16": dict(cmp="bf16", ortho=False),
        "f32": dict(cmp="f32", ortho=False),
        "ortho": dict(cmp="i32", ortho=True),
        "orthog64": dict(cmp="i32", ortho=True, g=64),
        "orthof32g64": dict(cmp="f32", ortho=True, g=64),
        "p2orthof32g64": dict(cmp="f32", ortho=True, g=64, p=2),
        # cost-split diagnostics (checksums intentionally differ)
        "distonly": dict(cmp="i32", ortho=False, mode="distonly"),
        "histonly": dict(cmp="i32", ortho=False, mode="histonly"),
    }
    for name in variants:
        if name == "base":
            continue
        kw = spec[name]
        out, ms = time_variant(name, functools.partial(
            lambda ps, kw: rdf_v2(
                ps, cell_j, spb_j, args.dr, n_sp, bins,
                interpret=args.interpret, **kw), kw=kw))
        if kw.get("mode", "full") == "full":
            check(name, out)
        results[name] = (out, ms)


if __name__ == "__main__":
    main()
