"""Executor (L3) — the arithmetization front-end.

Framework counterpart of the reference's src/sm/* + src/executor (SURVEY.md
§2.3): co-processor state machines that turn requested operations ("actions")
into committed trace columns plus the AIR constraints that prove them.

Each state machine module exposes:
  build_air(n_bits)              -> (AIR, metadata)   — the PIL role
  execute(actions, n_bits)       -> (N, nCols) uint64 trace — the executor role

and the `Executor` coordinator runs a set of SMs over an action batch,
mirroring Executor::execute's dispatch (src/executor/executor.cpp:487-610) —
but where the reference fills 751 columns of ONE shared trace, each SM here
is proven by its own eSTARK instance and the coordinator chains them
(cross-SM lookup unification is the planned next step).
"""

from .executor import Executor, BatchActions

__all__ = ["Executor", "BatchActions"]
