from amof_tpu.pore.core import Pore
from amof_tpu.pore.zeopp import network

__all__ = ["Pore", "network"]
