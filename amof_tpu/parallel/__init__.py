from amof_tpu.parallel.mesh import analysis_mesh
from amof_tpu.parallel.pipeline import FusedAnalysis

__all__ = ["analysis_mesh", "FusedAnalysis"]
