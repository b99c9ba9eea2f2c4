"""Probe: dynamic LANE-axis slicing inside a Mosaic kernel.

The z-windowed candidate kernel needs to read a [F, wz] window from a
[F, Wext] VMEM-resident run table at a per-(tile, chunk) dynamic lane
offset. This probes whether Mosaic (a) compiles that, and (b) runs it
at speed, vs the same reduction over the full table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_lane_slice.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles, F, Wext, wz = 256, 8, 2048, 104
    S, G = 36, 37  # subcols x z-rows per (tile, chunk)

    rng = np.random.default_rng(0)
    table = np.asarray(rng.random((n_tiles, F, Wext)), np.float32)
    table[:, 3, :] *= 0.02  # thresholds small enough that 'ok' is mixed
    table = jnp.asarray(table)
    starts = jnp.asarray(
        rng.integers(0, Wext - wz, size=(n_tiles,)), jnp.int32
    )

    def kern(starts_ref, tab_ref, out_ref):
        i = pl.program_id(0)
        st = starts_ref[i]
        fx = tab_ref[0, 0, pl.ds(st, wz)]  # dynamic lane slice
        fy = tab_ref[0, 1, pl.ds(st, wz)]
        fz = tab_ref[0, 2, pl.ds(st, wz)]
        th = tab_ref[0, 3, pl.ds(st, wz)]
        # realistic compute: [S, wz] hoist + [S, G, wz] quadratic + all
        # integer iota then convert: Mosaic's tpu.iota is int-only
        sub = (
            jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
            .astype(jnp.float32) / S
        )
        dfx = sub - fx[None, :]
        dfy = sub - fy[None, :]
        qq = dfx * dfx + dfy * dfy
        qdz = 2.0 * dfx * dfy
        vz = (
            jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
            .astype(jnp.float32) / G
        )
        u = vz - fz[None, None, :]
        u = u - jnp.round(u)
        d2 = qq[:, None, :] + u * u + u * qdz[:, None, :]
        ok = jnp.all(d2 >= th[None, None, :], axis=2)
        out_ref[0] = ok

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, F, Wext), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, G), lambda i, s: (i, 0, 0)),
    )
    interpret = jax.devices()[0].platform == "cpu"
    run = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, S, G), jnp.bool_),
        interpret=interpret,
    )

    @jax.jit
    def probe(starts, table):
        return jnp.sum(run(starts, table).astype(jnp.int32))

    # correctness oracle: same wz window at the same per-tile starts,
    # sliced with lax.dynamic_slice — must match the Pallas checksum
    @jax.jit
    def windowed_xla(starts, table):
        def one_tile(start, tab):
            win = jax.lax.dynamic_slice(tab, (0, start), (F, wz))
            fx, fy, fz, th = (win[k] for k in range(4))
            sub = (jnp.arange(S, dtype=jnp.float32) / S)[:, None]
            dfx = sub - fx[None, :]
            dfy = sub - fy[None, :]
            qq = dfx * dfx + dfy * dfy
            qdz = 2.0 * dfx * dfy
            vz = (jnp.arange(G, dtype=jnp.float32) / G)[None, :, None]
            u = vz - fz[None, None, :]
            u = u - jnp.round(u)
            d2 = qq[:, None, :] + u * u + u * qdz[:, None, :]
            return jnp.all(d2 >= th[None, None, :], axis=2)

        return jax.vmap(one_tile)(starts, table)

    # full-window XLA reference cost: same compute over Wext candidates
    @jax.jit
    def full_xla(table):
        sub = (jnp.arange(S, dtype=jnp.float32) / S)[:, None]
        fx, fy, fz, th = (table[:, k, :] for k in range(4))
        dfx = sub[None] - fx[:, None, :]
        dfy = sub[None] - fy[:, None, :]
        qq = dfx * dfx + dfy * dfy
        qdz = 2.0 * dfx * dfy
        vz = (jnp.arange(G, dtype=jnp.float32) / G)[None, None, :, None]
        u = vz - fz[:, None, None, :]
        u = u - jnp.round(u)
        d2 = qq[:, :, None, :] + u * u + u * qdz[:, :, None, :]
        ok = jnp.all(d2 >= th[:, None, None, :], axis=3)
        return jnp.sum(ok.astype(jnp.int32))

    print(f"devices={jax.devices()}", file=sys.stderr)
    t0 = time.time()
    v = float(np.asarray(probe(starts, table)))
    print(f"pallas windowed: compile+run {time.time() - t0:.1f}s chk={v}")
    ok_pallas = np.asarray(jax.jit(run)(starts, table))
    ok_ref = np.asarray(windowed_xla(starts, table))
    np.testing.assert_array_equal(ok_pallas, ok_ref)
    n_true = int(ok_ref.sum())
    assert 0 < n_true < ok_ref.size, "degenerate oracle (all-true/all-false)"
    print(f"windowed xla oracle: elementwise match, {n_true}/{ok_ref.size} ok")
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(np.asarray(probe(starts, table)))
        ts.append(time.time() - t0)
    print(f"pallas windowed: {min(ts) * 1e3:.2f} ms "
          f"({n_tiles}x{S}x{G}x{wz} tests)")

    t0 = time.time()
    v = float(np.asarray(full_xla(table)))
    print(f"xla full: compile+run {time.time() - t0:.1f}s chk={v}")
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(np.asarray(full_xla(table)))
        ts.append(time.time() - t0)
    print(f"xla full: {min(ts) * 1e3:.2f} ms "
          f"({n_tiles}x{S}x{G}x{Wext} tests)")


if __name__ == "__main__":
    main()
