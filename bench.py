"""
Benchmark: fused RDF+BAD+CN+MSD analysis throughput (frames/sec).

Workload mirrors the driver's north star (BASELINE.json): a 10k-atom
amorphous-ZIF-composition trajectory analyzed with the fused on-device
pipeline. The baseline is the target "10k frames RDF+BAD+CN+MSD(+pore)
in < 60 s on a v5e-8", i.e. 166.7 frames/s on 8 chips = 20.83 frames/s
per chip; vs_baseline is measured single-chip frames/s over that
per-chip figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostics go to stderr.
"""

import argparse
import json
import sys
import time

import numpy as np


def make_trajectory(n_frames, n_atoms, seed=0):
    """Amorphous ZIF-glass-like batch: Zn(C3N2H3)2 stoichiometry at the
    ZIF-4 number density (0.062 atoms/A^3)."""
    rng = np.random.default_rng(seed)
    counts = {
        30: n_atoms // 17,          # Zn
        7: 4 * (n_atoms // 17),     # N
        6: 6 * (n_atoms // 17),     # C
    }
    counts[1] = n_atoms - sum(counts.values())  # H fills the rest
    species = np.concatenate(
        [np.full(c, z, np.int64) for z, c in counts.items()]
    )
    box = (n_atoms / 0.062) ** (1 / 3)
    base = rng.uniform(0, box, (n_atoms, 3)).astype(np.float32)
    # frames = base + small thermal displacements (analysis cost is
    # independent of how physical the structure is)
    disp = rng.normal(0, 0.1, (n_frames, n_atoms, 3)).astype(np.float32)
    positions = (base[None] + np.cumsum(disp, axis=0)) % box
    cells = np.tile(np.eye(3, dtype=np.float32) * box, (n_frames, 1, 1))
    from amof_tpu.core.frames import FrameBatch

    return FrameBatch(
        positions, cells, species.astype(np.int32),
        np.arange(n_frames, dtype=np.int32),
    ), box


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=128)
    parser.add_argument("--atoms", type=int, default=10240)
    parser.add_argument("--dr", type=float, default=0.02)
    parser.add_argument("--dtheta", type=float, default=0.05)
    parser.add_argument("--chunk", type=int, default=256)
    parser.add_argument("--method", type=str, default=None)
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes for a fast correctness run")
    parser.add_argument("--no-bad", action="store_true")
    parser.add_argument("--no-msd", action="store_true")
    parser.add_argument("--max-neighbors", type=int, default=8,
                        help="initial BAD neighbor capacity; doubled "
                             "automatically while the overflow flag fires")
    args = parser.parse_args()

    if args.smoke:
        args.frames, args.atoms, args.dr, args.dtheta = 4, 512, 0.1, 1.0

    import jax

    from amof_tpu.parallel.mesh import analysis_mesh
    from amof_tpu.parallel.pipeline import FusedAnalysis

    if args.method is None and jax.default_backend() != "cpu":
        args.method = "pallas"  # fused Mosaic RDF kernel (frames-only mesh)

    print(
        f"bench: devices={jax.devices()} frames={args.frames} "
        f"atoms={args.atoms}", file=sys.stderr,
    )
    batch, box = make_trajectory(args.frames, args.atoms)
    mesh = analysis_mesh()  # all available devices, frames axis

    k_cap = args.max_neighbors
    while True:
        fa = FusedAnalysis(
            {"Zn-N": 2.0, "C-C": 1.75, "C-N": 1.73, "C-H": 1.3},
            dr=args.dr, dtheta=args.dtheta, chunk=args.chunk,
            method=args.method, with_bad=not args.no_bad,
            with_msd=not args.no_msd, max_neighbors=k_cap,
        )
        step_fn, fargs, meta = fa.prepare(batch, mesh=mesh)
        # keep inputs device-resident: numpy args would re-upload the
        # whole batch through the (remote) tunnel on every timed call
        fargs = jax.device_put(fargs)

        def run_once():
            out = step_fn(*fargs)
            # force a full device->host sync: block_until_ready is not a
            # reliable barrier on remote-tunnel backends
            for v in out.values():
                float(np.asarray(v).sum())
            return out

        t0 = time.time()
        out = run_once()
        compile_time = time.time() - t0
        print(f"bench: first call (compile+run, K={k_cap}) "
              f"{compile_time:.1f}s", file=sys.stderr)
        if args.no_bad or not np.asarray(out["bad_overflow"]).any():
            break
        k_cap *= 2  # capacity insufficient: retry, never truncate
        print(f"bench: neighbor capacity overflow, retrying with "
              f"K={k_cap}", file=sys.stderr)
        if k_cap > 1024:
            raise RuntimeError("neighbor capacity runaway")

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        out = run_once()
        times.append(time.time() - t0)
    best = min(times)
    frames_per_sec = args.frames / best
    n_chips = len(jax.devices())
    baseline_per_chip = 10000.0 / 60.0 / 8.0  # north star scaled per chip
    vs_baseline = frames_per_sec / (baseline_per_chip * n_chips)

    print(
        f"bench: times={['%.3f' % t for t in times]} "
        f"rdf_total={float(np.asarray(out['rdf_counts']).sum()):.3e}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "frames/sec fused RDF+BAD+CN+MSD, 10k-atom amorphous ZIF",
        "value": round(frames_per_sec, 3),
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
