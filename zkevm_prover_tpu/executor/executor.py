"""Executor coordinator — run the co-processor SMs over an action batch.

Reference: src/executor/executor.cpp:487-610 (serial) / 648-701 (one pthread
per SM with dependency joins). Here each SM's trace generation is a pure
function of the action batch, so they are dispatched independently; the
device proves them with per-SM eSTARK instances via `prove_all`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..stark.prover import StarkProver
from ..stark.setup import StarkSetup
from ..stark.verifier import verify
from .sm import (arith, binary, climb_key, mem_align, memory, padding_kk,
                 padding_pg, padding_sha256, storage)


@dataclasses.dataclass
class BatchActions:
    """The "required actions" a main-execution pass emits for co-processors
    (reference: MainExecRequired vectors, main_executor.cpp)."""

    binary: list = dataclasses.field(default_factory=list)
    memory: list = dataclasses.field(default_factory=list)
    arith: list = dataclasses.field(default_factory=list)
    mem_align: list = dataclasses.field(default_factory=list)
    poseidon_g: list = dataclasses.field(default_factory=list)
    padding_pg: list = dataclasses.field(default_factory=list)
    climb_key: list = dataclasses.field(default_factory=list)
    # emitted by the Main SM; proved by the Storage / PaddingKK / PaddingSha
    # machines (storage actions currently host-verified via hashdb.smt)
    storage: list = dataclasses.field(default_factory=list)
    keccak: list = dataclasses.field(default_factory=list)
    sha256: list = dataclasses.field(default_factory=list)
    hashp: list = dataclasses.field(default_factory=list)  # byte-level


from .sm import poseidon_g  # noqa: E402

_SM_MODULES = {"binary": binary, "memory": memory, "arith": arith,
               "mem_align": mem_align, "poseidon_g": poseidon_g,
               "padding_pg": padding_pg, "climb_key": climb_key,
               "storage": storage, "padding_kk": padding_kk,
               "padding_sha256": padding_sha256}

# per-SM trace degree — the reference fixes one N = 2^23 for all SMs; with
# per-SM STARK instances each machine gets the smallest domain that fits its
# lookup tables (binary's nibble-semantics table needs 2816 rows)
DEFAULT_BITS = {"binary": 13, "memory": 9, "arith": 9, "mem_align": 9,
                "poseidon_g": 9, "padding_pg": 9, "climb_key": 10,
                "main": 9, "storage": 9, "padding_kk": 11,
                "padding_sha256": 11}


class Executor:
    """Owns one AIR/setup/prover per SM (built lazily per domain size)."""

    def __init__(self, n_bits: int | dict | None = None, n_queries: int = 8):
        if n_bits is None:
            self.n_bits = dict(DEFAULT_BITS)
        elif isinstance(n_bits, int):
            self.n_bits = {k: n_bits for k in DEFAULT_BITS}
        else:
            self.n_bits = {**DEFAULT_BITS, **n_bits}
        self.n_queries = n_queries
        self._provers: dict[str, StarkProver] = {}

    def binary_slice_bits(self) -> int:
        """Largest slice width whose semantics table fits the binary domain
        (28·4^s rows): 4-bit nibbles from 2^13 up, 2-bit below."""
        n = 1 << self.n_bits["binary"]
        s = 1
        while 28 * (4 ** (s + 1)) <= n and s < 4:
            s += 1
        return s

    def _prover(self, name: str, hash_type: str = "GL") -> StarkProver:
        key = name if hash_type == "GL" else f"{name}:{hash_type}"
        if key not in self._provers:
            if name == "binary":
                air = binary.build_air(self.n_bits[name], self.binary_slice_bits())
            else:
                air = _SM_MODULES[name].build_air(self.n_bits[name])
            setup = StarkSetup(air, n_queries=self.n_queries, fri_fold_bits=2,
                               hash_type=hash_type)
            self._provers[key] = StarkProver(setup)
        return self._provers[key]

    def execute(self, actions: BatchActions,
                db=None) -> dict[str, np.ndarray]:
        """Fill each SM's committed columns (reference: Executor::execute).

        Runs the Storage SM first — its tree-walk replay emits PoseidonG /
        ClimbKey requests that must join the batch before those SMs fill
        their traces (the reference's Storage→ClimbKey / →PoseidonG pthread
        dependency joins, executor.cpp:648-701)."""
        out = {}
        if actions.storage:
            if db is None:
                raise ValueError("storage actions require the hashdb "
                                 "database (pass db=smt.db)")
            out["storage"], emitted = storage.execute(
                actions.storage, self.n_bits["storage"], db)
            actions.poseidon_g = actions.poseidon_g + emitted["poseidon_g"]
            actions.climb_key = actions.climb_key + emitted["climb_key"]
        if actions.keccak:
            # the emitted absorb-chain permutations feed the KeccakF SM; its
            # ~155k-row slot needs a >= 2^18 domain, so it is proved in the
            # dedicated keccak_f module rather than per-batch here
            out["padding_kk"], _, _ = padding_kk.execute(
                actions.keccak, self.n_bits["padding_kk"])
        if actions.sha256:
            # same split: Sha256F proves the compressions at its own domain
            out["padding_sha256"], _, _ = padding_sha256.execute(
                actions.sha256, self.n_bits["padding_sha256"])
        if actions.binary:
            out["binary"] = binary.execute(
                actions.binary, self.n_bits["binary"], self.binary_slice_bits()
            )
        if actions.memory:
            out["memory"], _ = memory.execute(actions.memory, self.n_bits["memory"])
        if actions.arith:
            out["arith"] = arith.execute(actions.arith, self.n_bits["arith"])
        if actions.mem_align:
            out["mem_align"], _ = mem_align.execute(
                actions.mem_align, self.n_bits["mem_align"])
        if actions.poseidon_g:
            out["poseidon_g"] = poseidon_g.execute(
                actions.poseidon_g, self.n_bits["poseidon_g"])
        if actions.padding_pg:
            out["padding_pg"], _ = padding_pg.execute(
                actions.padding_pg, self.n_bits["padding_pg"])
        if actions.climb_key:
            out["climb_key"] = climb_key.execute(
                actions.climb_key, self.n_bits["climb_key"])
        return out

    def counters(self, actions: BatchActions) -> dict[str, int]:
        """SM usage counters (reference: batch resource counters,
        main.cpp:193-216) — drive upstream batch-capacity limits."""
        return {
            "binary": len(actions.binary),
            "binary_capacity": (1 << self.n_bits["binary"])
            // binary.rows_per_op(self.binary_slice_bits()),
            "memory": len(actions.memory),
            "memory_capacity": 1 << self.n_bits["memory"],
            "arith": len(actions.arith),
            "arith_capacity": (1 << self.n_bits["arith"]) // arith.GROUP,
            "mem_align": len(actions.mem_align),
            "mem_align_capacity": (1 << self.n_bits["mem_align"])
            // mem_align.GROUP,
            "poseidon_g": len(actions.poseidon_g),
            "poseidon_g_capacity": (1 << self.n_bits["poseidon_g"])
            // poseidon_g.GROUP,
            "padding_pg": len(actions.padding_pg),
            "padding_pg_capacity": (1 << self.n_bits["padding_pg"])
            // padding_pg.GROUP,
            "climb_key": len(actions.climb_key),
            "climb_key_capacity": (1 << self.n_bits["climb_key"])
            // (64 // climb_key.params_for(self.n_bits["climb_key"])[0]),
        }

    def prove_all(self, actions: BatchActions, db=None) -> dict[str, object]:
        """Prove every active SM; returns {name: (prover, proof)}."""
        return self.prove_traces(self.execute(actions, db=db))

    def prove_traces(self, traces: dict[str, np.ndarray],
                     hash_type: str = "GL") -> dict[str, object]:
        """Prove pre-computed commit pols — the resume half of the
        commit-pols checkpoint (reference test/prover/main.cpp:6-50 proves
        from a saved zkevm.commit without re-executing)."""
        proofs = {}
        for name, tr in traces.items():
            prover = self._prover(name, hash_type)
            proofs[name] = (prover, prover.prove(np.asarray(tr)))
        return proofs

    def prove_recursive(self, actions: BatchActions,
                        db=None) -> dict[str, object]:
        """The StarkRecursiveF role: re-prove every active SM under the
        BN128 commitment scheme so the proofs are verifiable inside the
        final SNARK circuit (reference starkRecursiveF, prover.cpp:868)."""
        traces = self.execute(actions, db=db)
        proofs = {}
        for name, tr in traces.items():
            prover = self._prover(name, hash_type="BN128")
            proofs[name] = (prover, prover.prove(tr))
        return proofs

    # -- Main SM (ROM) path ------------------------------------------------

    def run_rom(self, rom, input: dict | None = None, smt=None):
        """Execute a zk-ASM ROM program (reference: fork_9 MainExecutor) —
        fills the Main trace and emits the co-processor action batch."""
        from .sm import main_sm

        return main_sm.MainExecutor(
            rom, self.n_bits["main"]).execute(input=input, smt=smt)

    def main_prover(self, rom) -> StarkProver:
        """Prover for the Main AIR bound to `rom` (cached per ROM object)."""
        from .sm import main_sm

        key = ("main", id(rom))
        if key not in self._provers:
            air = main_sm.build_air(rom, self.n_bits["main"])
            self._provers[key] = StarkProver(
                StarkSetup(air, n_queries=self.n_queries, fri_fold_bits=2))
        return self._provers[key]

    def prove_rom_batch(self, rom, input: dict | None = None,
                        smt=None) -> tuple[object, dict]:
        """Full batch proof from a ROM: Main proof + all dispatched co-SM
        proofs (reference: Executor::execute + Prover::genBatchProof)."""
        res = self.run_rom(rom, input=input, smt=smt)
        prover = self.main_prover(rom)
        proofs = {"main": (prover, prover.prove(res.trace))}
        proofs.update(self.prove_all(
            res.actions, db=smt.db if smt is not None else None))
        return res, proofs

    def verify_all(self, proofs: dict) -> bool:
        for name, (prover, proof) in proofs.items():
            if not verify(prover.setup, prover.verkey, proof):
                return False
        return True
