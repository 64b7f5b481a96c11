"""HashDB — the state layer (L2).

TPU-framework counterpart of the reference's src/hashdb + src/service/hashdb
(SURVEY.md §2.2): a Poseidon sparse Merkle tree (`smt`), a node/program store
with an in-memory map and optional file persistence (`database`), per-batch
write buffering with versioning (`state_manager`), and the `HashDB` facade
that the executor and the gRPC service call (`hashdb_interface`).

The tree hashing itself runs on the host for single get/set calls (they are
latency-bound, a handful of Poseidon permutations) and on the device in
batch (`smt.batch_leaf_hashes`) when the executor re-hashes many nodes —
mirroring how the reference keeps SMT work scalar but AVX-batches Poseidon.
"""

from .database import Database
from .smt import Smt, SmtGetResult, SmtSetResult
from .state_manager import StateManager
from .hashdb_interface import HashDB

__all__ = [
    "Database", "Smt", "SmtGetResult", "SmtSetResult", "StateManager", "HashDB",
]
