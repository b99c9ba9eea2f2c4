from amof_tpu.elastic.core import (
    ElasticConstant,
    MechanicalProperties,
    print_Cmat,
)
from amof_tpu.elastic.elate import Elastic

__all__ = ["ElasticConstant", "MechanicalProperties", "print_Cmat", "Elastic"]
