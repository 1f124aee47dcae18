from .config import SimConfig, Solver, SpringParams, XPBDParams, CollisionParams, SelfCollisionParams
from .state import State, make_state
from .topology import Topology, HostTopology, cloth_grid, from_tet_mesh, from_triangle_mesh, tet_cube
