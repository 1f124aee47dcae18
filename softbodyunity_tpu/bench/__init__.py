from .runner import run_preset  # noqa: F401
