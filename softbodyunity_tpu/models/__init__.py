from . import presets
