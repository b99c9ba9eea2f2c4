"""
Typed configuration for analysis defaults.

The reference scatters its knobs across constructor kwargs and two
environment variables (SURVEY.md §5.6: dr/rmax at amof/rdf.py:38,
dtheta at amof/bad.py:39, MSD windows at amof/msd.py:157, ring depth at
amof/ring/core.py:64, distance margins at amof/coordination/zif.py:19-21
and reduce.py:41-42, ZEOpp_EXEC at pore/pysimmzeopp.py:50). This module
promotes them to one typed object with the same defaults, used as the
fallback by the analysis classes and overridable per call.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class AnalysisConfig:
    # RDF (amof/rdf.py:38)
    rdf_dr: float = 0.01
    rdf_rmax: object = "half_cell"
    # BAD (amof/bad.py:39)
    bad_dtheta: float = 0.05
    # MSD (amof/msd.py:157)
    msd_delta_time: int = 100
    msd_max_time: object = "half"
    msd_timestep: int = 1
    msd_origin_policy: str = "amof"
    # pore (amof/pore/pysimmzeopp.py:93-95)
    pore_probe_radius: float = 1.2
    pore_chan_radius: float = 1.2
    pore_num_samples: int = 50000
    pore_resolution: float = 0.2
    # rings (amof/ring/core.py:64)
    ring_max_search_depth: int = 32
    # coordination margins (amof/coordination/zif.py:19-21, reduce.py:41)
    dist_margin: float = 1.2
    dist_margin_metal: float = 1.6
    dist_margin_H: float = 1.44
    # device execution
    histogram_method: Optional[str] = None  # None -> backend default
    pair_chunk: int = 256
    max_neighbors: int = 16

    @classmethod
    def from_env(cls, prefix: str = "AMOF_TPU_") -> "AnalysisConfig":
        """Build a config overriding defaults from environment variables
        (e.g. AMOF_TPU_RDF_DR=0.02) — the typed successor of the
        reference's ad-hoc env handling."""
        cfg = cls()
        for field in dataclasses.fields(cls):
            env = os.environ.get(prefix + field.name.upper())
            if env is None:
                continue
            current = getattr(cfg, field.name)
            if isinstance(current, bool):
                value = env.lower() in ("1", "true", "yes")
            elif isinstance(current, int):
                value = int(env)
            elif isinstance(current, float):
                value = float(env)
            else:
                value = env
            setattr(cfg, field.name, value)
        return cfg


DEFAULT = AnalysisConfig()
