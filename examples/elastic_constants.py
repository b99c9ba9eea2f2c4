"""
Elastic constants and mechanical properties from a CP2K cell file.

Mirrors the reference's "Elastic constants and mechanical properties"
example.

Run:  python examples/elastic_constants.py path/to/trajectory.cell
"""

import sys

from amof_tpu.elastic import (
    ElasticConstant,
    MechanicalProperties,
    print_Cmat,
)
from amof_tpu.io.cp2k import read_tabular

cell_file = sys.argv[1] if len(sys.argv) > 1 else next(
    (p for p in ("toy_trajectory.cell",
                 "/root/reference/examples/files/toy_trajectory.cell")
     if __import__("os").path.exists(p)), "toy_trajectory.cell",
)
df = read_tabular(cell_file)
h = df[[c for c in df.columns if c[0] in "ABC" and len(c) == 2]].to_numpy()
h = h.reshape(-1, 3, 3)

elastic = ElasticConstant.from_cell(h, temperature=300.0,
                                    step=df.index.to_numpy())
elastic.write("example.elastic")
C_final = elastic.Cmat.values[-1]
print_Cmat(C_final)

mech = MechanicalProperties.from_elastic(C_final.tolist())
print(mech.data)
mech.write("example.mech.csv")
