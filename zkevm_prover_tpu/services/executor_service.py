"""Executor gRPC server + client — the sequencer-facing fast path.

Reference: src/service/executor/executor_service.cpp (ProcessBatch with
input validation -> Prover::processBatch, response building with the
FullTracer's block/tx/log payloads, GetFlushStatus).
"""

from __future__ import annotations

import json
from concurrent import futures

import grpc

from ..executor import BatchActions
from ..prover import ProofInput, Prover, PublicInputs
from . import rpc
from .rpc import register, unary, unary_stub

import executor_pb2 as pb  # noqa: E402

SERVICE = "executor.v1.ExecutorService"

# ROM error-string -> RomError enum (executor_service.cpp:2500-2539)
_ROM_ERRORS = {
    "": pb.ROM_ERROR_NO_ERROR,
    "OOG": pb.ROM_ERROR_OUT_OF_GAS,
    "revert": pb.ROM_ERROR_EXECUTION_REVERTED,
    "overflow": pb.ROM_ERROR_STACK_OVERFLOW,
    "underflow": pb.ROM_ERROR_STACK_UNDERFLOW,
    "OOCS": pb.ROM_ERROR_OUT_OF_COUNTERS_STEP,
    "OOCK": pb.ROM_ERROR_OUT_OF_COUNTERS_KECCAK,
    "OOCB": pb.ROM_ERROR_OUT_OF_COUNTERS_BINARY,
    "OOCM": pb.ROM_ERROR_OUT_OF_COUNTERS_MEM,
    "OOCA": pb.ROM_ERROR_OUT_OF_COUNTERS_ARITH,
    "OOCPA": pb.ROM_ERROR_OUT_OF_COUNTERS_PADDING,
    "OOCPO": pb.ROM_ERROR_OUT_OF_COUNTERS_POSEIDON,
    "OOCSH": pb.ROM_ERROR_OUT_OF_COUNTERS_SHA,
    "intrinsic_invalid_signature": pb.ROM_ERROR_INTRINSIC_INVALID_SIGNATURE,
    "intrinsic_invalid_chain_id": pb.ROM_ERROR_INTRINSIC_INVALID_CHAIN_ID,
    "intrinsic_invalid_nonce": pb.ROM_ERROR_INTRINSIC_INVALID_NONCE,
    "intrinsic_invalid_gas_limit": pb.ROM_ERROR_INTRINSIC_INVALID_GAS_LIMIT,
    "intrinsic_invalid_gas_overflow": pb.ROM_ERROR_INTRINSIC_TX_GAS_OVERFLOW,
    "intrinsic_invalid_balance": pb.ROM_ERROR_INTRINSIC_INVALID_BALANCE,
    "intrinsic_invalid_batch_gas_limit":
        pb.ROM_ERROR_INTRINSIC_INVALID_BATCH_GAS_LIMIT,
    "intrinsic_invalid_sender_code":
        pb.ROM_ERROR_INTRINSIC_INVALID_SENDER_CODE,
    "invalidRLP": pb.ROM_ERROR_INVALID_RLP,
    "invalidJump": pb.ROM_ERROR_INVALID_JUMP,
    "invalidOpcode": pb.ROM_ERROR_INVALID_OPCODE,
    "invalidAddressCollision": pb.ROM_ERROR_CONTRACT_ADDRESS_COLLISION,
    "invalidStaticTx": pb.ROM_ERROR_INVALID_STATIC,
    "invalidCodeSize": pb.ROM_ERROR_MAX_CODE_SIZE_EXCEEDED,
    "invalidCodeStartsEF": pb.ROM_ERROR_INVALID_BYTECODE_STARTS_EF,
    "invalid_fork_id": pb.ROM_ERROR_UNSUPPORTED_FORK_ID,
    "invalid_change_l2_block_limit_timestamp":
        pb.ROM_ERROR_INVALID_TX_CHANGE_L2_BLOCK_LIMIT_TIMESTAMP,
    "invalid_change_l2_block_min_timestamp":
        pb.ROM_ERROR_INVALID_TX_CHANGE_L2_BLOCK_MIN_TIMESTAMP,
    "invalidDecodeChangeL2Block":
        pb.ROM_ERROR_INVALID_DECODE_CHANGE_L2_BLOCK,
    "invalidNotFirstTxChangeL2Block":
        pb.ROM_ERROR_INVALID_NOT_FIRST_TX_CHANGE_L2_BLOCK,
    "invalid_l1_info_tree_index": pb.ROM_ERROR_INVALID_L1_INFO_TREE_INDEX,
}


def rom_error(s: str) -> int:
    return _ROM_ERRORS.get(s, pb.ROM_ERROR_UNSPECIFIED)


def _hb(hex_str: str) -> bytes:
    """0x-hex string -> bytes (empty on empty/None)."""
    s = (hex_str or "").removeprefix("0x")
    return bytes.fromhex("0" + s if len(s) % 2 else s)


def _step_pb(s) -> "pb.TransactionStep":
    return pb.TransactionStep(
        state_root=_hb(s.state_root), depth=s.depth, pc=s.pc, gas=s.gas,
        gas_cost=max(0, s.gas_cost), gas_refund=s.gas_refund, op=s.op,
        stack=[hex(v) for v in s.stack], memory=_hb(s.memory),
        memory_size=s.memory_size, memory_offset=s.memory_offset,
        return_data=_hb("".join(s.return_data)),
        contract=pb.Contract(
            address=s.contract.address, caller=s.contract.caller,
            value=str(s.contract.value), data=_hb(s.contract.data),
            gas=s.contract.gas, type=s.contract.type),
        error=rom_error(s.error), storage=dict(s.storage))


def _log_pb(log) -> "pb.Log":
    return pb.Log(
        address=log.address, topics=[_hb(t) for t in log.topics],
        data=_hb("".join(log.data)), block_number=log.block_number,
        tx_hash=_hb(log.tx_hash), tx_hash_l2=_hb(log.tx_hash_l2),
        tx_index=log.tx_index, block_hash=_hb(log.block_hash),
        index=log.index)


def _tx_pb(r) -> "pb.ProcessTransactionResponse":
    c = r.context
    return pb.ProcessTransactionResponse(
        tx_hash=_hb(r.tx_hash), tx_hash_l2=_hb(r.tx_hash_l2),
        rlp_tx=bytes(r.rlp_tx), block_hash=_hb(r.block_hash),
        block_number=r.block_number, type=r.type,
        return_value=_hb(r.return_value), gas_left=r.gas_left,
        gas_used=r.gas_used, cumulative_gas_used=r.cumulative_gas_used,
        gas_refunded=r.gas_refunded, error=rom_error(r.error),
        create_address=r.create_address, state_root=_hb(r.state_root),
        logs=[_log_pb(lg) for lg in r.logs],
        full_trace=pb.FullTrace(
            context=pb.TransactionContext(
                type=c.type, **{"from": c.from_}, to=c.to, data=_hb(c.data),
                gas=c.gas, value=str(c.value), gas_used=c.gas_used,
                gas_price=str(c.gas_price),
                old_state_root=_hb(c.old_state_root),
                tx_index=c.tx_index, chain_id=c.chain_id,
                output=_hb(c.output)),
            steps=[_step_pb(s) for s in r.steps]),
        effective_gas_price=r.effective_gas_price,
        effective_percentage=r.effective_percentage,
        has_gasprice_opcode=int(r.has_gasprice_opcode),
        has_balance_opcode=int(r.has_balance_opcode), status=r.status)


def _block_pb(b) -> "pb.ProcessBlockResponse":
    return pb.ProcessBlockResponse(
        parent_hash=_hb(b.parent_hash), coinbase=b.coinbase,
        gas_limit=b.gas_limit, block_number=b.block_number,
        timestamp=b.timestamp, ger=_hb(b.ger),
        block_hash_l1=_hb(b.block_hash_l1), gas_used=b.gas_used,
        block_info_root=_hb(b.block_info_root), block_hash=_hb(b.block_hash),
        responses=[_tx_pb(r) for r in b.responses],
        logs=[_log_pb(lg) for lg in b.logs], error=rom_error(b.error))


def tracer_response_fields(tracer) -> dict:
    """ProcessBatchResponse fields built from a FullTracer — the response
    assembly of executor_service.cpp ProcessBatchV2."""
    ft = tracer.final_trace
    rw = {}
    for addr, info in tracer.read_write_addresses.items():
        rw[addr] = pb.InfoReadWrite(
            nonce=info.nonce, balance=info.balance, sc_code=info.sc_code,
            sc_storage=dict(info.sc_storage), sc_length=info.sc_length)
    return {
        "block_responses": [_block_pb(b) for b in ft.block_responses],
        "read_write_addresses": rw,
        "gas_used": ft.gas_used,
        "invalid_batch": int(ft.invalid_batch),
        "error_rom": rom_error(ft.error),
        "new_local_exit_root": ft.new_local_exit_root,
    }


def stateless_proof_input(witness: bytes, data_stream: bytes, *,
                          old_acc_input_hash: str = "",
                          old_batch_num: int = 0,
                          l1_info_root: str = "",
                          timestamp_limit: int = 0) -> ProofInput:
    """Reconstruct a provable batch input from witness + data stream —
    shared by the executor service's ProcessStatelessBatch and the
    aggregator channel's GenStatelessBatchProof (reference:
    executor_service.cpp:1716 / aggregator.proto:32)."""
    from ..prover import datastream as ds
    from ..prover import witness as wit

    db, root, programs = wit.witness_to_db(witness)
    batch = ds.parse(data_stream)
    l2_data = ds.batch_to_l2_data(batch)
    # canonical fea2scalar: limb i contributes << 64*i
    root_hex = "0x" + format(
        sum(int(root[i]) << (64 * i) for i in range(4)), "064x")
    seq = (batch.blocks[0].coinbase.hex()
           if batch.blocks else "00" * 20)
    return ProofInput(
        publics=PublicInputs(
            old_state_root=root_hex,
            old_acc_input_hash=old_acc_input_hash or "0x" + "00" * 32,
            old_batch_num=old_batch_num or batch.batch_number,
            chain_id=batch.chain_id or 1000,
            fork_id=batch.fork_id or 9,
            batch_l2_data="0x" + l2_data.hex(),
            l1_info_root=l1_info_root or "0x" + "00" * 32,
            timestamp_limit=timestamp_limit,
            sequencer_addr="0x" + seq,
        ),
        # Database._k strings are limb0..limb3 hex-concatenated —
        # decode back to fe4 tuples (NOT a big-endian scalar)
        db={tuple(int(k[i * 16:(i + 1) * 16], 16) for i in range(4)): v
            for k, v in db._nodes.items()},
        contracts_bytecode={hex(k): v.hex()
                            for k, v in programs.items()},
    )


class ExecutorServiceImpl:
    def __init__(self, prover: Prover):
        self.prover = prover

    def ProcessBatch(self, req, ctx):
        # input validation (the reference rejects malformed roots/data first)
        for field in ("old_state_root", "old_acc_input_hash"):
            v = getattr(req, field)
            if v and (not v.startswith("0x") or len(v) > 66):
                return pb.ProcessBatchResponse(error=1)
        try:
            acts = json.loads(req.actions_json) if req.actions_json else {}
            from ..prover.input import L1Data, _hex_int
            tree = {}
            if req.l1_info_tree_json:
                for key, e in json.loads(req.l1_info_tree_json).items():
                    tree[int(key)] = L1Data(
                        global_exit_root=_hex_int(e.get("globalExitRoot")),
                        block_hash_l1=_hex_int(e.get("blockHash")),
                        min_timestamp=int(e.get("timestamp", 0)),
                        smt_proof=[_hex_int(h)
                                   for h in e.get("smtProof", [])])
            tc = {}
            if req.HasField("trace_config"):
                tc = {"disableStorage": bool(req.trace_config.disable_storage),
                      "disableStack": bool(req.trace_config.disable_stack),
                      "enableMemory": bool(req.trace_config.enable_memory),
                      "enableReturnData":
                          bool(req.trace_config.enable_return_data)}
            inp = ProofInput(
                publics=PublicInputs(
                    old_state_root=req.old_state_root or "0x" + "00" * 32,
                    old_acc_input_hash=req.old_acc_input_hash or "0x" + "00" * 32,
                    old_batch_num=req.old_batch_num,
                    chain_id=req.chain_id or 1000,
                    fork_id=req.fork_id or 9,
                    batch_l2_data=req.batch_l2_data or "0x",
                    l1_info_root=req.l1_info_root or "0x" + "00" * 32,
                    timestamp_limit=req.timestamp_limit,
                    sequencer_addr=req.sequencer_addr or "0x" + "00" * 20,
                ),
                actions=BatchActions(
                    binary=acts.get("binary", []),
                    memory=acts.get("memory", []),
                    arith=acts.get("arith", []),
                ),
                db={k: json.loads(v) if v.startswith("[") else v
                    for k, v in req.db.items()},
                contracts_bytecode=dict(req.contracts_bytecode),
                l1_info_tree=tree,
                skip_first_change_l2_block=req.skip_first_change_l2_block,
                skip_write_block_info_root=req.skip_write_block_info_root,
                skip_verify_l1_info_root=req.skip_verify_l1_info_root,
                trace_config=tc,
            )
            res = self.prover.process_batch(inp)
        except Exception:  # noqa: BLE001 — internal error surface
            return pb.ProcessBatchResponse(error=2)
        pub = res["publics"]
        extra = {}
        if res.get("tracer") is not None:
            extra = tracer_response_fields(res["tracer"])
        return pb.ProcessBatchResponse(
            new_state_root=pub.new_state_root,
            new_acc_input_hash=pub.new_acc_input_hash,
            new_batch_num=pub.new_batch_num,
            error=0,
            counters={k: v for k, v in res["counters"].items()},
            prover_id="zkevm-prover-tpu",
            fork_id=int(pub.fork_id),
            **extra,
        )

    def ProcessStatelessBatch(self, req, ctx):
        """Reconstruct the batch input from witness + data stream
        (reference: ProcessStatelessBatchV2, executor_service.cpp:1716)."""
        try:
            inp = stateless_proof_input(
                req.witness, req.data_stream,
                old_acc_input_hash=req.old_acc_input_hash,
                old_batch_num=req.old_batch_num,
                l1_info_root=req.l1_info_root,
                timestamp_limit=req.timestamp_limit,
            )
            res = self.prover.process_batch(inp)
        except Exception:  # noqa: BLE001 — internal error surface
            return pb.ProcessBatchResponse(error=2)
        pub = res["publics"]
        extra = {}
        if res.get("tracer") is not None:
            extra = tracer_response_fields(res["tracer"])
        return pb.ProcessBatchResponse(
            new_state_root=pub.new_state_root,
            new_acc_input_hash=pub.new_acc_input_hash,
            new_batch_num=pub.new_batch_num,
            error=0,
            counters={k: v for k, v in res["counters"].items()},
            prover_id="zkevm-prover-tpu",
            fork_id=int(pub.fork_id),
            **extra,
        )

    def GetFlushStatus(self, req, ctx):
        return pb.GetFlushStatusResponse(prover_id="zkevm-prover-tpu")


def serve_executor(port: int, prover: Prover, max_workers: int = 8) -> grpc.Server:
    impl = ExecutorServiceImpl(prover)
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    register(server, SERVICE, {
        "ProcessBatch": unary(impl.ProcessBatch, pb.ProcessBatchRequest),
        # V2 method names a real sequencer dials (reference
        # executor.proto:12-13) — same unified handler
        "ProcessBatchV2": unary(impl.ProcessBatch, pb.ProcessBatchRequest),
        "ProcessStatelessBatch": unary(impl.ProcessStatelessBatch,
                                       pb.ProcessStatelessBatchRequest),
        "ProcessStatelessBatchV2": unary(impl.ProcessStatelessBatch,
                                         pb.ProcessStatelessBatchRequest),
        "GetFlushStatus": unary(impl.GetFlushStatus, pb.Empty),
    })
    server.add_insecure_port(f"[::]:{port}")
    server.start()
    server.impl = impl
    return server


class ExecutorClient:
    def __init__(self, target: str):
        self._channel = grpc.insecure_channel(target)
        self._process = unary_stub(self._channel, SERVICE, "ProcessBatch",
                                   pb.ProcessBatchResponse)
        self._status = unary_stub(self._channel, SERVICE, "GetFlushStatus",
                                  pb.GetFlushStatusResponse)

    def process_batch(self, *, old_state_root="0x" + "00" * 32,
                      old_batch_num=0, actions=None, **kw):
        req = pb.ProcessBatchRequest(
            old_state_root=old_state_root, old_batch_num=old_batch_num,
            actions_json=json.dumps(actions or {}), **kw,
        )
        return self._process(req)

    def process_batch_input(self, pi, trace_config: dict | None = None):
        """ProcessBatch from a reference-schema ProofInput (the request the
        sequencer would send for this testvector)."""
        p = pi.publics
        tc = trace_config if trace_config is not None else pi.trace_config
        req = pb.ProcessBatchRequest(
            old_state_root=p.old_state_root,
            old_acc_input_hash=p.old_acc_input_hash,
            old_batch_num=int(p.old_batch_num),
            chain_id=int(p.chain_id), fork_id=int(p.fork_id),
            batch_l2_data=p.batch_l2_data, l1_info_root=p.l1_info_root,
            timestamp_limit=int(str(p.timestamp_limit), 0)
            if not isinstance(p.timestamp_limit, int) else p.timestamp_limit,
            sequencer_addr=p.sequencer_addr,
            db={k: json.dumps(v) if isinstance(v, list) else v
                for k, v in pi.db.items()},
            contracts_bytecode=dict(pi.contracts_bytecode),
            skip_first_change_l2_block=pi.skip_first_change_l2_block,
            skip_write_block_info_root=pi.skip_write_block_info_root,
            skip_verify_l1_info_root=pi.skip_verify_l1_info_root,
            l1_info_tree_json=json.dumps({
                str(i): {"globalExitRoot": hex(e.global_exit_root),
                         "blockHash": hex(e.block_hash_l1),
                         "timestamp": str(e.min_timestamp),
                         "smtProof": [hex(h) for h in e.smt_proof]}
                for i, e in pi.l1_info_tree.items()}),
        )
        if tc:
            req.trace_config.CopyFrom(pb.TraceConfig(
                disable_storage=int(tc.get("disableStorage", 0)),
                disable_stack=int(tc.get("disableStack", 0)),
                enable_memory=int(tc.get("enableMemory", 0)),
                enable_return_data=int(tc.get("enableReturnData", 0))))
        return self._process(req)

    def get_flush_status(self):
        return self._status(pb.Empty())

    def process_stateless_batch(self, *, witness: bytes, data_stream: bytes,
                                v2: bool = False, **kw):
        stub = unary_stub(
            self._channel, SERVICE,
            "ProcessStatelessBatchV2" if v2 else "ProcessStatelessBatch",
            pb.ProcessBatchResponse)
        return stub(pb.ProcessStatelessBatchRequest(
            witness=witness, data_stream=data_stream, **kw))

    def process_batch_v2(self, **kw):
        """ProcessBatchV2 by its wire name (reference executor.proto:12)."""
        stub = unary_stub(self._channel, SERVICE, "ProcessBatchV2",
                          pb.ProcessBatchResponse)
        return stub(pb.ProcessBatchRequest(**kw))
