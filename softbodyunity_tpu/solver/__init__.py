from . import collide, forces, hashgrid, normals, step, xpbd
