"""Proof request input — publics + batch payload.

Reference: src/prover/input.{hpp,cpp} (publics oldStateRoot/oldAccInputHash/
batchL2Data/l1InfoRoot/timestampLimit/forkID/chainID..., db key->values map,
contractsBytecode; verified against testvectors/e2e/fork_9/input_executor_0.json).
"""

from __future__ import annotations

import dataclasses
import json

from ..executor import BatchActions
from ..ops import keccak


@dataclasses.dataclass
class PublicInputs:
    """The chaining publics of a batch proof (reference: PublicInputs)."""

    old_state_root: str = "0x" + "00" * 32
    old_acc_input_hash: str = "0x" + "00" * 32
    old_batch_num: int = 0
    chain_id: int = 1000
    fork_id: int = 9
    batch_l2_data: str = "0x"
    l1_info_root: str = "0x" + "00" * 32
    timestamp_limit: int = 0
    sequencer_addr: str = "0x" + "00" * 20
    aggregator_addr: str = "0x" + "00" * 20
    # filled by execution:
    new_state_root: str = "0x" + "00" * 32
    new_acc_input_hash: str = "0x" + "00" * 32
    new_batch_num: int = 0
    new_local_exit_root: str = "0x" + "00" * 32

    def acc_input_hash(self) -> str:
        """Accumulated input hash chaining (keccak over the old acc hash and
        this batch's data — the reference's accInputHash recurrence)."""
        payload = (
            bytes.fromhex(self.old_acc_input_hash[2:])
            + bytes.fromhex(self.batch_l2_data[2:] or "")
            + bytes.fromhex(self.l1_info_root[2:])
            + self.timestamp_limit.to_bytes(8, "big")
            + bytes.fromhex(self.sequencer_addr[2:])
        )
        return "0x" + keccak.keccak256(payload).hex()


@dataclasses.dataclass
class ProofInput:
    publics: PublicInputs
    actions: BatchActions = dataclasses.field(default_factory=BatchActions)
    db: dict = dataclasses.field(default_factory=dict)           # key -> 12 fe
    contracts_bytecode: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_json(cls, text: str) -> "ProofInput":
        d = json.loads(text)
        pub = PublicInputs(**{
            k: d[js] for k, js in _PUB_KEYS.items() if js in d
        })
        acts = BatchActions(
            binary=d.get("binaryActions", []),
            memory=d.get("memoryActions", []),
            arith=d.get("arithActions", []),
        )
        return cls(publics=pub, actions=acts, db=d.get("db", {}),
                   contracts_bytecode=d.get("contractsBytecode", {}))

    def to_json(self) -> str:
        p = self.publics
        d = {js: getattr(p, k) for k, js in _PUB_KEYS.items()}
        d["binaryActions"] = self.actions.binary
        d["memoryActions"] = self.actions.memory
        d["arithActions"] = self.actions.arith
        d["db"] = self.db
        d["contractsBytecode"] = self.contracts_bytecode
        return json.dumps(d, indent=1)


_PUB_KEYS = {
    "old_state_root": "oldStateRoot",
    "old_acc_input_hash": "oldAccInputHash",
    "old_batch_num": "oldNumBatch",
    "chain_id": "chainID",
    "fork_id": "forkID",
    "batch_l2_data": "batchL2Data",
    "l1_info_root": "l1InfoRoot",
    "timestamp_limit": "timestampLimit",
    "sequencer_addr": "sequencerAddr",
    "aggregator_addr": "aggregatorAddress",
    "new_state_root": "newStateRoot",
    "new_acc_input_hash": "newAccInputHash",
    "new_batch_num": "newNumBatch",
    "new_local_exit_root": "newLocalExitRoot",
}
