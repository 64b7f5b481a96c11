"""Executor gRPC server + client — the sequencer-facing fast path.

Reference: src/service/executor/executor_service.cpp (ProcessBatch with
input validation -> Prover::processBatch, GetFlushStatus).
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
                db=dict(req.db),
                contracts_bytecode=dict(req.contracts_bytecode),
            )
            res = self.prover.process_batch(inp)
        except Exception:  # noqa: BLE001 — internal error surface
            return pb.ProcessBatchResponse(error=2)
        pub = res["publics"]
        return pb.ProcessBatchResponse(
            new_state_root=pub.new_state_root,
            new_acc_input_hash=pub.new_acc_input_hash,
            new_batch_num=pub.new_batch_num,
            error=0,
            counters={k: v for k, v in res["counters"].items()},
            prover_id="zkevm-prover-tpu",
        )

    def ProcessStatelessBatch(self, req, ctx):
        """Reconstruct the batch input from witness + data stream
        (reference: ProcessStatelessBatchV2, executor_service.cpp:1716)."""
        from ..prover import datastream as ds
        from ..prover import witness as wit

        try:
            db, root, programs = wit.witness_to_db(req.witness)
            batch = ds.parse(req.data_stream)
            l2_data = ds.batch_to_l2_data(batch)
            root_hex = "0x" + b"".join(
                int(root[i]).to_bytes(8, "little")
                for i in range(4)).hex()
            seq = (batch.blocks[0].coinbase.hex()
                   if batch.blocks else "00" * 20)
            inp = ProofInput(
                publics=PublicInputs(
                    old_state_root=root_hex,
                    old_acc_input_hash=req.old_acc_input_hash
                    or "0x" + "00" * 32,
                    old_batch_num=req.old_batch_num or batch.batch_number,
                    chain_id=batch.chain_id or 1000,
                    fork_id=batch.fork_id or 9,
                    batch_l2_data="0x" + l2_data.hex(),
                    l1_info_root=req.l1_info_root or "0x" + "00" * 32,
                    timestamp_limit=req.timestamp_limit,
                    sequencer_addr="0x" + seq,
                ),
                db={k: v for k, v in db._nodes.items()},
                contracts_bytecode={hex(k): v.hex()
                                    for k, v in programs.items()},
            )
            res = self.prover.process_batch(inp)
        except Exception:  # noqa: BLE001 — internal error surface
            return pb.ProcessBatchResponse(error=2)
        pub = res["publics"]
        return pb.ProcessBatchResponse(
            new_state_root=pub.new_state_root,
            new_acc_input_hash=pub.new_acc_input_hash,
            new_batch_num=pub.new_batch_num,
            error=0,
            counters={k: v for k, v in res["counters"].items()},
            prover_id="zkevm-prover-tpu",
        )

    def GetFlushStatus(self, req, ctx):
        return pb.GetFlushStatusResponse(prover_id="zkevm-prover-tpu")


def serve_executor(port: int, prover: Prover, max_workers: int = 8) -> grpc.Server:
    impl = ExecutorServiceImpl(prover)
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    register(server, SERVICE, {
        "ProcessBatch": unary(impl.ProcessBatch, pb.ProcessBatchRequest),
        "ProcessStatelessBatch": unary(impl.ProcessStatelessBatch,
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

    def get_flush_status(self):
        return self._status(pb.Empty())

    def process_stateless_batch(self, *, witness: bytes, data_stream: bytes,
                                **kw):
        stub = unary_stub(self._channel, SERVICE, "ProcessStatelessBatch",
                          pb.ProcessBatchResponse)
        return stub(pb.ProcessStatelessBatchRequest(
            witness=witness, data_stream=data_stream, **kw))
