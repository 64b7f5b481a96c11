"""Fork dispatch — map a batch's forkID to its ROM program.

Reference: src/main_sm/fork_N/ — the reference compiles one executor per
fork (9 copies of the main-SM source tree, selected in prover.cpp by
proverRequest.input.publicInputsExtended.publicInputs.forkID).  Here one
interpreter executes any fork's rom.json; the fork only selects the
program (and, for older forks, the input-schema variant).

Forks 7 (dragonfruit), 8 (elderberry) and 9 (etrog/feijoa line) ship
`scripts/rom.json` in the reference snapshot; forks 1-6 carry only the
PIL metadata (their ROMs are embedded in generated C++), so they load
only if the user supplies the JSON.
"""

from __future__ import annotations

import os

from .rom import Rom

REFERENCE_ROOT = "/root/reference/src/main_sm"

_CACHE: dict[int, Rom] = {}


def rom_path(fork_id: int, root: str = REFERENCE_ROOT) -> str:
    return os.path.join(root, f"fork_{fork_id}", "scripts", "rom.json")


def supported_forks(root: str = REFERENCE_ROOT) -> list[int]:
    return [f for f in range(1, 10) if os.path.exists(rom_path(f, root))]


def rom_for_fork(fork_id: int, root: str = REFERENCE_ROOT) -> Rom:
    """Load (and cache) the ROM for a fork; raises if its rom.json is not
    available in the reference tree."""
    key = fork_id
    if key not in _CACHE:
        path = rom_path(fork_id, root)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"fork {fork_id}: no rom.json at {path} (forks with ROMs: "
                f"{supported_forks(root)})")
        _CACHE[key] = Rom.from_json(path)
    return _CACHE[key]
