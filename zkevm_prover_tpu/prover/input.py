"""Proof request input — publics + batch payload, reference JSON schema.

Reference: src/prover/input.{hpp,cpp} — loadGlobals (publics, l1InfoTree,
traceConfig flags, input.cpp:150-560) and loadDatabase (db key->12 fe,
contractsBytecode, input.cpp:640-720).  Parses the reference testvector
files (testvectors/e2e/fork_9/input_executor_*.json) verbatim, including
the fields round 1 lacked: batchL2Data bytes, db node map, contracts
bytecode, the l1InfoTree, and the skip flags.

Two consumers:
  * `executor_input()` — the dict handed to MainExecutor.execute / the
    eval_command getters (getTxs, getL1InfoGER, getSmtProof, ...);
  * `seed_database()` — preloads a hashdb.Database with the node/program
    preimages so the SMT can walk from oldStateRoot.

The legacy pre-cooked action lists (binaryActions/...) remain accepted for
the synthetic pipeline tests.
"""

from __future__ import annotations

import dataclasses
import json

from ..executor import BatchActions
from ..ops import keccak


def _hex_int(v, default=0) -> int:
    """Accept 0x-hex strings, decimal strings, or ints."""
    if v is None:
        return default
    if isinstance(v, int):
        return v
    s = str(v)
    if s.startswith("0x") or s.startswith("0X"):
        return int(s, 16) if len(s) > 2 else 0
    # bare hex (no 0x) appears for roots in some vectors; decimals for
    # timestamps — reference uses stringIsDec/stringIsHex to pick
    return int(s, 10) if s.isdigit() else int(s, 16)


def _hex32(v: int) -> str:
    return "0x" + v.to_bytes(32, "big").hex()


def scalar_to_fe4(v: int) -> tuple[int, int, int, int]:
    """256-bit scalar -> 4 little-endian 64-bit limbs (reference scalar2fea
    for roots/keys, scalar_fea variants in src/utils/scalar.cpp)."""
    m = (1 << 64) - 1
    return (v & m, (v >> 64) & m, (v >> 128) & m, (v >> 192) & m)


@dataclasses.dataclass
class L1Data:
    """One l1InfoTree entry (reference: L1Data, input.hpp)."""

    global_exit_root: int = 0
    block_hash_l1: int = 0
    min_timestamp: int = 0
    smt_proof: list[int] = dataclasses.field(default_factory=list)


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
    forced_blockhash_l1: str = "0x" + "00" * 32
    sequencer_addr: str = "0x" + "00" * 20
    aggregator_addr: str = "0x" + "00" * 20
    # pre-fork-7 (etrog) publics: one GER + timestamp per batch instead of
    # the l1InfoTree (reference fork_5/6 PublicInputs, input.cpp loadGlobals)
    global_exit_root: str = "0x" + "00" * 32
    timestamp: int = 0
    # filled by execution / expected outputs in testvectors:
    new_state_root: str = "0x" + "00" * 32
    new_acc_input_hash: str = "0x" + "00" * 32
    new_batch_num: int = 0
    new_local_exit_root: str = "0x" + "00" * 32

    def acc_input_hash(self) -> str:
        """The accInputHash recurrence — exactly what the ROM computes at
        finalizeBatch. Fork >= 7 (fork_9 rom.json lines 76-95): keccak over
        oldAccInputHash(32) || batchHashData(32) || l1InfoRoot(32) ||
        timestampLimit(8) || sequencerAddr(20) || forcedBlockHashL1(32).
        Fork <= 6 (fork_5 rom.json batchHashData/accInputHash vars, checked
        bit-for-bit against testvectors/performance/*.json newAccInputHash):
        keccak over oldAccInputHash(32) || batchHashData(32) ||
        globalExitRoot(32) || timestamp(8) || sequencerAddr(20).
        batchHashData = keccak(batchL2Data) in both."""
        batch_hash_data = keccak.keccak256(
            bytes.fromhex(self.batch_l2_data[2:] or ""))
        if int(self.fork_id) <= 6:
            payload = (
                bytes.fromhex(self.old_acc_input_hash[2:])
                + batch_hash_data
                + bytes.fromhex(self.global_exit_root[2:])
                + int(self.timestamp).to_bytes(8, "big")
                + bytes.fromhex(self.sequencer_addr[2:])
            )
            return "0x" + keccak.keccak256(payload).hex()
        ts = self.timestamp_limit if isinstance(self.timestamp_limit, int) \
            else int(str(self.timestamp_limit), 0)
        payload = (
            bytes.fromhex(self.old_acc_input_hash[2:])
            + batch_hash_data
            + bytes.fromhex(self.l1_info_root[2:])
            + ts.to_bytes(8, "big")
            + bytes.fromhex(self.sequencer_addr[2:])
            + bytes.fromhex(self.forced_blockhash_l1[2:])
        )
        return "0x" + keccak.keccak256(payload).hex()


@dataclasses.dataclass
class ProofInput:
    publics: PublicInputs
    actions: BatchActions = dataclasses.field(default_factory=BatchActions)
    db: dict = dataclasses.field(default_factory=dict)           # key -> 12 fe
    contracts_bytecode: dict = dataclasses.field(default_factory=dict)
    l1_info_tree: dict = dataclasses.field(default_factory=dict)  # idx->L1Data
    # trace/skip flags (reference: bSkipVerifyL1InfoRoot etc.)
    skip_verify_l1_info_root: bool = False
    skip_first_change_l2_block: bool = False
    skip_write_block_info_root: bool = False
    no_counters: bool = False
    update_merkle_tree: bool = True
    timestamp: int = 0
    trace_config: dict = dataclasses.field(default_factory=dict)

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
        tree = {}
        for key, e in d.get("l1InfoTree", {}).items():
            if not str(key).isdigit():
                continue  # skip non-index keys (e.g. "skipVerifyL1InfoRoot")
            tree[int(key)] = L1Data(
                global_exit_root=_hex_int(e.get("globalExitRoot")),
                block_hash_l1=_hex_int(e.get("blockHash")),
                min_timestamp=int(e.get("timestamp", 0)),
                smt_proof=[_hex_int(h) for h in e.get("smtProof", [])],
            )
        return cls(
            publics=pub, actions=acts,
            db=d.get("db", {}),
            contracts_bytecode=d.get("contractsBytecode", {}),
            l1_info_tree=tree,
            skip_verify_l1_info_root=bool(d.get("skipVerifyL1InfoRoot", False)),
            skip_first_change_l2_block=bool(
                d.get("skipFirstChangeL2Block", False)),
            skip_write_block_info_root=bool(
                d.get("skipWriteBlockInfoRoot", False)),
            no_counters=bool(d.get("noCounters", False)),
            update_merkle_tree=bool(d.get("updateMerkleTree", True)),
            timestamp=int(d.get("timestamp", 0)),
            trace_config=d.get("traceConfig", {}),
        )

    def make_full_tracer(self, rom):
        """A FullTracer bound to this input's traceConfig flags."""
        from ..executor.full_tracer import FullTracer, TraceConfig
        return FullTracer(
            rom, TraceConfig.from_json(self.trace_config),
            no_counters=self.no_counters,
            skip_first_change_l2_block=self.skip_first_change_l2_block)

    @classmethod
    def from_file(cls, path: str) -> "ProofInput":
        with open(path) as f:
            return cls.from_json(f.read())

    def to_json(self) -> str:
        p = self.publics
        d = {js: getattr(p, k) for k, js in _PUB_KEYS.items()}
        d["binaryActions"] = self.actions.binary
        d["memoryActions"] = self.actions.memory
        d["arithActions"] = self.actions.arith
        d["db"] = self.db
        d["contractsBytecode"] = self.contracts_bytecode
        if self.l1_info_tree:
            d["l1InfoTree"] = {
                str(i): {
                    "globalExitRoot": _hex32(e.global_exit_root),
                    "blockHash": _hex32(e.block_hash_l1),
                    "timestamp": str(e.min_timestamp),
                    "smtProof": [_hex32(h) for h in e.smt_proof],
                } for i, e in self.l1_info_tree.items()}
        if self.skip_verify_l1_info_root:
            d["skipVerifyL1InfoRoot"] = True
        return json.dumps(d, indent=1)

    # -- executor bridge ----------------------------------------------------

    def executor_input(self) -> dict:
        """The input dict MainExecutor.execute / eval_command consume."""
        p = self.publics
        return {
            "oldStateRootScalar": _hex_int(p.old_state_root),
            "oldAccInputHash": _hex_int(p.old_acc_input_hash),
            "oldBatchNum": int(p.old_batch_num),
            "chainID": int(p.chain_id),
            "forkID": int(p.fork_id),
            "batchL2Data": bytes.fromhex(p.batch_l2_data[2:] or ""),
            "sequencerAddr": _hex_int(p.sequencer_addr),
            "l1InfoRoot": _hex_int(p.l1_info_root),
            "timestampLimit": int(str(p.timestamp_limit), 0)
            if not isinstance(p.timestamp_limit, int) else p.timestamp_limit,
            "forcedBlockHashL1": _hex_int(p.forced_blockhash_l1),
            "globalExitRoot": _hex_int(p.global_exit_root),
            "timestamp": int(p.timestamp or self.timestamp),
            "l1InfoTree": {
                i: {"globalExitRoot": e.global_exit_root,
                    "blockHashL1": e.block_hash_l1,
                    "minTimestamp": e.min_timestamp,
                    "smtProof": e.smt_proof}
                for i, e in self.l1_info_tree.items()},
            "skipVerifyL1InfoRoot": self.skip_verify_l1_info_root,
            "skipFirstChangeL2Block": self.skip_first_change_l2_block,
            "skipWriteBlockInfoRoot": self.skip_write_block_info_root,
            "noCounters": self.no_counters,
        }

    def seed_database(self, database) -> None:
        """Preload a hashdb.Database with the input's node and program
        preimages (reference Input::loadDatabase, input.cpp:640-720).
        Keys are 256-bit hex scalars (or fe4 tuples from the witness
        parser); values are 12-element lists of hex strings or ints."""
        for key, vals in self.db.items():
            fe4 = key if isinstance(key, tuple) else \
                scalar_to_fe4(_hex_int(key))
            database.write(fe4, [v if isinstance(v, int) else int(v, 16)
                                 for v in vals])
        for key, code in self.contracts_bytecode.items():
            fe4 = key if isinstance(key, tuple) else \
                scalar_to_fe4(_hex_int(key))
            database.set_program(
                fe4, code if isinstance(code, bytes)
                else bytes.fromhex(code.removeprefix("0x")))


_PUB_KEYS = {
    "old_state_root": "oldStateRoot",
    "old_acc_input_hash": "oldAccInputHash",
    "old_batch_num": "oldNumBatch",
    "chain_id": "chainID",
    "fork_id": "forkID",
    "batch_l2_data": "batchL2Data",
    "l1_info_root": "l1InfoRoot",
    "timestamp_limit": "timestampLimit",
    "forced_blockhash_l1": "forcedBlockHashL1",
    "sequencer_addr": "sequencerAddr",
    "aggregator_addr": "aggregatorAddress",
    "new_state_root": "newStateRoot",
    "new_acc_input_hash": "newAccInputHash",
    "new_batch_num": "newNumBatch",
    "new_local_exit_root": "newLocalExitRoot",
    "global_exit_root": "globalExitRoot",
    "timestamp": "timestamp",
}
