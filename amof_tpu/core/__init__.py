from amof_tpu.core.frames import Frame, FrameBatch, Trajectory, as_frame_batch
from amof_tpu.core.step import construct_step

__all__ = ["Frame", "FrameBatch", "Trajectory", "as_frame_batch", "construct_step"]
