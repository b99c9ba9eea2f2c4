"""Microbench: lax.sort channel-count cost vs key+iota sort + flat
gathers, at neighbor-table shapes (N ~ 10752), K frames per jit.

Decides whether the per-frame sorts in the BAD table and the pore
column kernels should carry payload channels through the sort or
permute payloads afterwards with flat gathers.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices={jax.devices()}", file=sys.stderr)
    k, n = 32, 10752
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.random((k, n), np.float32))
    pay = jnp.asarray(rng.random((k, 5, n), np.float32))

    @jax.jit
    def sort6(keys, pay):
        def one(args):
            kk, p = args
            out = jax.lax.sort(
                (kk, p[0], p[1], p[2], p[3], p[4]),
                dimension=0, num_keys=1,
            )
            return sum(jnp.sum(o) for o in out[1:])
        return jnp.sum(jax.lax.map(one, (keys, pay)))

    @jax.jit
    def sort2_gather(keys, pay):
        def one(args):
            kk, p = args
            _, perm = jax.lax.sort(
                (kk, jnp.arange(n, dtype=jnp.int32)),
                dimension=0, num_keys=1,
            )
            ps = p[:, perm]  # [5, N] flat gather along axis 1
            return jnp.sum(ps)
        return jnp.sum(jax.lax.map(one, (keys, pay)))

    @jax.jit
    def sort1(keys, pay):
        def one(args):
            kk, p = args
            out = jax.lax.sort((kk,), dimension=0, num_keys=1)
            return jnp.sum(out[0]) + jnp.sum(p[0, :1])
        return jnp.sum(jax.lax.map(one, (keys, pay)))

    @jax.jit
    def argsort_only(keys, pay):
        def one(args):
            kk, p = args
            _, perm = jax.lax.sort(
                (kk, jnp.arange(n, dtype=jnp.int32)),
                dimension=0, num_keys=1,
            )
            return jnp.sum(perm) + jnp.sum(p[0, :1])
        return jnp.sum(jax.lax.map(one, (keys, pay)))

    def time_it(name, fn):
        t0 = time.time()
        v = float(np.asarray(fn(keys, pay)))
        ct = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(np.asarray(fn(keys, pay)))
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts) / k * 1e3:.3f} ms/frame "
              f"(compile {ct:.0f}s chk {v:.4g})", file=sys.stderr)

    time_it("sort 1key+5payload (6ch)", sort6)
    time_it("sort 1key+iota, gather 5", sort2_gather)
    time_it("sort key only (1ch)", sort1)
    time_it("argsort (2ch)", argsort_only)
    print("done")


if __name__ == "__main__":
    main()
