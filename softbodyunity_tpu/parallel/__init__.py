from . import batch, halo, rl, sharding
