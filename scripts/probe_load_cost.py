"""Decompose the fused glass program's warm-start cost by kernel family.

The persistent XLA cache hits for every program (jit_step deserializes
in ~0.4 s), yet the FIRST EXECUTION of the glass fused program blocks
for 136-400 s on the tunneled TPU backend while the porous fused
program (same kernel families, smaller shapes) loads in ~3 s. This
probe times first-call vs steady-state for RDF-only and RDF+BAD
variants at the exact bench glass shapes (10240 atoms -> 11008 padded,
bins=2743 at dr=0.01) over a short 16-frame scan: the Mosaic kernel
instantiations are identical to the 128-frame bench program (per-frame
shapes, window, slab plan), only the scan length differs.

Run twice: first = cold compile, second = warm load cost.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import init_devices, make_trajectory  # noqa: E402


def timed(tag, fa, batch, mesh):
    import jax

    t_prep = time.time()
    step_fn, fargs, meta = fa.prepare(batch, mesh=mesh)
    fargs = jax.device_put(fargs)
    prep = time.time() - t_prep

    t0 = time.time()
    out = step_fn(*fargs)
    for v in out.values():
        float(np.asarray(v).sum())
    t1 = time.time()
    out = step_fn(*fargs)
    for v in out.values():
        float(np.asarray(v).sum())
    t2 = time.time()
    print(
        f"probe {tag}: prepare={prep:.1f}s first={t1 - t0:.1f}s "
        f"second={t2 - t1:.2f}s",
        flush=True,
    )


def main():
    import jax

    from amof_tpu.parallel.mesh import analysis_mesh
    from amof_tpu.parallel.pipeline import FusedAnalysis

    init_devices()
    print(f"probe: devices={jax.devices()}", flush=True)
    frames = 16
    batch, box = make_trajectory(frames, 10240)
    mesh = analysis_mesh(n_frames=frames)
    cut = {"Zn-N": 2.0, "C-C": 1.75, "C-N": 1.73, "C-H": 1.3}
    common = dict(dr=0.01, dtheta=0.05, chunk=256, method="pallas",
                  frames_per_call=None)

    variants = [
        ("rdf-only", dict(with_bad=False, with_msd=False)),
        ("rdf+bad ", dict(with_bad=True, with_msd=False)),
        ("rdf+bad+msd", dict(with_bad=True, with_msd=True)),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for tag, kw in variants:
        if only and only not in tag:
            continue
        timed(tag, FusedAnalysis(cut, **common, **kw), batch, mesh)


if __name__ == "__main__":
    main()
