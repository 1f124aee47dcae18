"""Multi-chip scaling demos on a virtual 8-device CPU mesh: data-parallel
scene batches and a halo-decomposed single large cloth (SURVEY.md C15/C16).

    python examples/03_multichip.py
"""

import __main__  # noqa: F401  (run from repo root)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import __graft_entry__ as graft


def main():
    graft.dryrun_multichip(8)


if __name__ == "__main__":
    main()
