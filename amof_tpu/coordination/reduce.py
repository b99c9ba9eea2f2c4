"""
Trajectory reduction to building units.

API parity with amof/coordination/reduce.py: ``reduce_trajectory(traj,
mof, filename, ...)`` :22 with the same MOF dispatch (ZIF-4 / ZIF-zni /
SALEM-2 -> MetalIm, ZIF-8 -> MetalmIm, ZnCycle -> MetalCycle, else
NotImplementedSearch :44-61), per-frame wrap + search + validity gate +
report collection incl. error capture (:86-111), the 1800 s per-frame
timeout (:135-150), and ReducedTrajectory assembly/writing (:119-131).
"""

from __future__ import annotations

import functools
import logging
import multiprocessing.pool

import pandas as pd

import amof_tpu.coordination.zif as zif
import amof_tpu.symbols
import amof_tpu.trajectory
from amof_tpu.coordination.core import NotImplementedSearch, SearchError
from amof_tpu.core.frames import as_frames

logger = logging.getLogger(__name__)

REDUCTION_TIMEOUT_S = 1800


def reduce_trajectory(trajectory, mof, filename=None, dist_margin=1.2,
                      delta_Step=1, first_frame=0, parallel=False,
                      write_mfpx=False, **kwargs):
    """Reduce a trajectory to its metal-node / linker network.

    Supports 'ZIF-4', 'ZIF-8', 'ZIF-zni', 'SALEM-2' fully, and
    'ZnCycle' for cycle-only detection.

    Args:
        trajectory: Trajectory / list of Frames / FrameBatch.
        mof: str, MOF name.
        filename: output basename (no writing if None).
        dist_margin: covalent-radius tolerance for linker bonds.
        write_mfpx: also write one mfpx file per reduced frame.
        kwargs: dist_margin_metal (default 1.6), dist_margin_H (1.44).
    """
    dist_margin_metal = kwargs.get("dist_margin_metal", 1.6)
    dist_margin_H = kwargs.get("dist_margin_H", 1.44)

    if mof in ["ZIF-4", "ZIF-zni", "SALEM-2"]:
        def structure_reducer(frame):
            return zif.MetalIm(
                frame, "Zn", dist_margin=dist_margin,
                dist_margin_metal=dist_margin_metal,
                dist_margin_H=dist_margin_H,
            )
        symbols = amof_tpu.symbols.DummySymbols(["Zn", "Im"])
    elif mof in ["ZIF-8"]:
        def structure_reducer(frame):
            return zif.MetalmIm(frame, "Zn", dist_margin=dist_margin)
        symbols = amof_tpu.symbols.DummySymbols(["Zn", "mIm"])
    elif mof in ["ZnCycle"]:
        def structure_reducer(frame):
            return zif.MetalCycle(frame, "Zn", dist_margin=dist_margin)
        symbols = amof_tpu.symbols.DummySymbols(["Zn", "ImCycle"])
        if write_mfpx:
            logger.error("Write mfpx is not implemented for %s", mof)
    else:
        def structure_reducer(frame):
            return NotImplementedSearch(mof)
        symbols = amof_tpu.symbols.DummySymbols()
        logger.warning("Structure search not implemented for %s", mof)
    return reduce_trajectory_core(
        trajectory, structure_reducer, symbols, filename,
        delta_Step=delta_Step, first_frame=first_frame,
        parallel=parallel, write_mfpx=write_mfpx,
    )


def reduce_trajectory_core(trajectory, structure_reducer, symbols,
                           filename=None, delta_Step=1, first_frame=0,
                           parallel=False, write_mfpx=False):
    """Run a structure reducer over every frame, assembling a
    ReducedTrajectory with per-frame report_search rows. ``parallel``
    follows the reference semantics (False/True/int — joblib fan-out at
    amof/coordination/reduce.py:113-117); the rule programs are pure
    Python, so the pool uses loky processes when available."""
    frames = as_frames(trajectory)
    logger.info("Start reducing trajectory for %s frames", len(frames))
    step = amof_tpu.trajectory.construct_step(
        delta_Step=delta_Step, first_frame=first_frame,
        number_of_frames=len(frames),
    )

    def per_frame(frame, step_i, filename):
        report_search = {"Step": step_i}
        try:
            if filename is not None:
                filename = f"{filename}_{step_i}"
            frame = frame.copy()
            frame.wrap()  # unwrapped stragglers stall the neighbor search
            reduced, report_frame = reduce_frame(
                frame, structure_reducer, symbols,
                write_mfpx=write_mfpx, filename=filename,
            )
            report_search["in_reduced_trajectory"] = reduced is not None
            report_search = {**report_search, **report_frame}
        except SearchError as e:
            logger.debug("Failed to reduce frame: %s", e.message)
            report_search["in_reduced_trajectory"] = False
            report_search = {**report_search, **e.report_search}
            report_search["Error_message"] = e.message
            reduced = None
        except BaseException as e:  # noqa: BLE001 — frame containment
            logger.debug("Failed to reduce frame: %s", e)
            report_search["in_reduced_trajectory"] = False
            report_search["Error_message"] = (
                "Unexpected Base Exception: " + str(e)
            )
            reduced = None
        return reduced, report_search

    from amof_tpu.parallel.host import parallel_map

    result_list = parallel_map(
        lambda args: per_frame(*args),
        ((frames[i], step[i], filename) for i in range(len(frames))),
        parallel, prefer="processes",
    )

    list_report_search = []
    reduced_traj = []
    for reduced, report_search in result_list:
        list_report_search.append(report_search)
        if report_search["in_reduced_trajectory"]:
            reduced_traj.append(reduced)

    df_report_search = pd.DataFrame(list_report_search).set_index("Step")
    reduced_trajectory = amof_tpu.trajectory.ReducedTrajectory(
        reduced_traj, df_report_search, symbols
    )
    if filename is not None:
        reduced_trajectory.write_to_file(filename)
    return reduced_trajectory


def with_timeout(timeout):
    """Per-call timeout via a one-thread pool (parity:
    amof/coordination/reduce.py:135-147)."""

    def decorator(decorated):
        @functools.wraps(decorated)
        def inner(*args, **kwargs):
            pool = multiprocessing.pool.ThreadPool(1)
            try:
                async_result = pool.apply_async(decorated, args, kwargs)
                try:
                    return async_result.get(timeout)
                except multiprocessing.TimeoutError:
                    raise SearchError("Timeout reached")
            finally:
                pool.terminate()

        return inner

    return decorator


@with_timeout(REDUCTION_TIMEOUT_S)
def reduce_frame(frame, structure_reducer, symbols, write_mfpx=False,
                 filename=None):
    """Reduce one frame; 30 min timeout guards pathological inputs.

    Returns (reduced Frame or None, report_search dict)."""
    searcher = structure_reducer(frame)
    searcher.symbols = symbols  # enforce the shared symbol registry
    reduced = searcher.reduce_structure()
    report_search = {
        "is_reduced_structure_valid": searcher.is_reduced_structure_valid(),
        **searcher.report_search,
    }
    if searcher.is_reduced_structure_valid():
        if write_mfpx and filename is not None:
            searcher.write_mfpx(filename)
        return reduced, report_search
    return None, report_search


# reference-name alias (amof/coordination/reduce.py:151)
reduce_atom = reduce_frame
