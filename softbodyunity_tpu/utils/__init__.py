from . import checkpoint, meshio, profiling
