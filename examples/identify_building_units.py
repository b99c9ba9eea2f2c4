"""
Identify the building units of ZIF-4 and compute ring statistics of the
metal-linker network.

Mirrors the reference's "Identify building units of ZIF-4" example.

Run:  python examples/identify_building_units.py path/to/ZIF-4.xyz
"""

import sys

import amof_tpu.coordination.reduce as amred
import amof_tpu.ring as amring
import amof_tpu.trajectory as amtraj

xyz = sys.argv[1] if len(sys.argv) > 1 else next(
    (p for p in ("ZIF-4.xyz", "/root/reference/examples/files/ZIF-4.xyz")
     if __import__("os").path.exists(p)), "ZIF-4.xyz",
)
traj = amtraj.read_traj(xyz, ":")

red_traj = amred.reduce_trajectory(traj, "ZIF-4", filename="example_reduced")
print("reduced atoms:", red_traj.trajectory[0].get_global_number_of_atoms())
print(red_traj.report_search.T)

ring = amring.Ring.from_reduced_trajectory(red_traj, max_search_depth=16)
arr = ring.data["ring"]
print("ring sizes (nodes):", arr.get_coord("ring_size"))
print("RC:", arr.sel(ring_var="RC").values.ravel())
