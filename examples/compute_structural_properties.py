"""
Compute structural properties of a ZIF-4 frame.

Mirrors the reference's "Compute structural properties" example
notebook, using amof_tpu's API: RDF, BAD, CN, MSD, pore and ring
analysis on a single-frame trajectory.

Run:  python examples/compute_structural_properties.py path/to/ZIF-4.xyz
"""

import sys

import amof_tpu.trajectory as amtraj

xyz = sys.argv[1] if len(sys.argv) > 1 else next(
    (p for p in ("ZIF-4.xyz", "/root/reference/examples/files/ZIF-4.xyz")
     if __import__("os").path.exists(p)), "ZIF-4.xyz",
)
traj = amtraj.read_traj(xyz, ":")
print(f"frames: {len(traj)}, atoms: {len(traj[0])}")

# --- RDF -------------------------------------------------------------
import amof_tpu.rdf as amrdf

rdf = amrdf.Rdf.from_trajectory(traj)
print("\nRDF columns:", list(rdf.data.columns))
rdf.write_to_file("example.rdf")
assert amrdf.Rdf.from_file("example.rdf").data.equals(rdf.data)

# --- Bond-angle distribution -----------------------------------------
import amof_tpu.bad as ambad

bad = ambad.Bad.from_trajectory(traj, {"Zn-N": 2.5}, dtheta=0.5)
peak = bad.data["theta"][bad.data["N-Zn-N"].idxmax()]
print(f"N-Zn-N peak at {peak:.2f} deg (tetrahedral: 109.47)")

# --- Coordination number ---------------------------------------------
import amof_tpu.cn as amcn

cn = amcn.CoordinationNumber.from_trajectory(traj, {"Zn-N": 2.5})
print("CN:", cn.data.to_dict("records"))

# --- MSD (needs a real multi-frame trajectory to be meaningful) -------
import amof_tpu.msd as ammsd

if len(traj) > 3:
    msd = ammsd.WindowMsd.from_trajectory(traj, delta_time=100, timestep=1)
    print(msd.data.head())

# --- Pore analysis -----------------------------------------------------
import amof_tpu.pore as ampore

pore = ampore.Pore.from_trajectory(traj)
print("\nPore:", pore.data.iloc[0].round(3).to_dict())

# --- Ring statistics ---------------------------------------------------
import amof_tpu.ring as amring

ring = amring.Ring.from_trajectory(
    traj, {"C-N": 1.728, "C-C": 1.752}, max_search_depth=6
)
arr = ring.data["ring"]
print("\nring sizes:", arr.get_coord("ring_size"),
      "RC:", arr.sel(ring_var="RC").values.ravel())
