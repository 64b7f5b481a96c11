"""Aggregator channel — the multi-prover scale-out control plane.

Reference: src/service/aggregator/aggregator_client.cpp (prover side: dial
the aggregator, serve one bidi stream, dispatch GetStatus / GenBatchProof /
GenAggregatedProof / GenFinalProof / Cancel / GetProof — :851-940) and
test/service/aggregator/aggregator_server.cpp (the in-repo test aggregator
that drives gen-batch -> gen-aggregated -> gen-final over real localhost
gRPC, SURVEY.md §4.5). A Watchdog guards stream liveness like
aggregator_client.cpp:873-888.
"""

from __future__ import annotations

import dataclasses
import json
import queue
import threading
import time
import uuid as uuidlib
from concurrent import futures

import grpc

from ..executor import BatchActions
from ..prover import ProofInput, Prover, ProverRequest, PublicInputs
from ..utils import Watchdog, zklog
from . import rpc
from .rpc import register, stream_stream, stream_stub

import aggregator_pb2 as pb  # noqa: E402

SERVICE = "aggregator.v1.AggregatorService"
PROTO_VERSION = "v1"
SERVER_VERSION = "zkevm-prover-tpu-0.1"


# ---------------------------------------------------------------------------
# prover side (the client that serves proofs)
# ---------------------------------------------------------------------------


class AggregatorClient:
    """Dials the aggregator and answers its requests with local proving."""

    def __init__(self, prover: Prover, target: str, prover_name: str = "tpu-prover",
                 watchdog_timeout_s: float | None = None):
        self.prover = prover
        self.target = target
        self.prover_name = prover_name
        self._proofs: dict[str, object] = {}  # request id -> result object
        self._requests: dict[str, ProverRequest] = {}
        self._out: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._watchdog = (
            Watchdog(watchdog_timeout_s, self._on_stall) if watchdog_timeout_s
            else None
        )
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._out.put(None)

    def _on_stall(self):
        zklog.error("aggregator stream watchdog fired; reconnecting")
        self._out.put(None)  # unblock the sender; _run loop reconnects

    def _sender(self):
        while True:
            msg = self._out.get()
            if msg is None:
                return
            yield msg

    def _run(self):
        while not self._stop.is_set():
            try:
                channel = grpc.insecure_channel(self.target)
                stub = stream_stub(channel, SERVICE, "Channel",
                                   pb.AggregatorMessage)
                if self._watchdog:
                    self._watchdog.start()
                for msg in stub(self._sender()):
                    if self._watchdog:
                        self._watchdog.kick()
                    self._out.put(self._handle(msg))
                    if self._stop.is_set():
                        break
            except grpc.RpcError as e:  # reconnect on stream failure
                if self._stop.is_set():
                    return
                zklog.warning(f"aggregator stream error: {e.code() if hasattr(e, 'code') else e}; retrying")
                time.sleep(0.2)
            finally:
                if self._watchdog:
                    self._watchdog.stop()

    # -- request dispatch (aggregator_client.cpp:891-940) ----------------------

    def _handle(self, msg) -> pb.ProverMessage:
        out = pb.ProverMessage(id=msg.id)
        kind = msg.WhichOneof("request")
        if kind == "get_status_request":
            out.get_status_response.CopyFrom(self._status())
        elif kind == "gen_batch_proof_request":
            rid = self._submit("genBatchProof",
                               self._parse_input(msg.gen_batch_proof_request.input))
            out.gen_batch_proof_response.id = rid
            out.gen_batch_proof_response.result = pb.RESULT_OK
        elif kind == "gen_stateless_batch_proof_request":
            # reference aggregator.proto:32 — witness/datastream batch
            # proving on the aggregator channel (fork >= 9 path)
            from .executor_service import stateless_proof_input

            pi = msg.gen_stateless_batch_proof_request.input.public_inputs
            try:
                inp = stateless_proof_input(
                    pi.witness, pi.data_stream,
                    old_acc_input_hash=(
                        "0x" + pi.old_acc_input_hash.hex()
                        if pi.old_acc_input_hash else ""),
                    l1_info_root=("0x" + pi.l1_info_root.hex()
                                  if pi.l1_info_root else ""),
                    timestamp_limit=pi.timestamp_limit,
                )
                rid = self._submit("genBatchProof", inp)
                out.gen_batch_proof_response.id = rid
                out.gen_batch_proof_response.result = pb.RESULT_OK
            except Exception as e:  # noqa: BLE001
                zklog.error(f"genStatelessBatchProof: {e}")
                out.gen_batch_proof_response.result = pb.RESULT_ERROR
        elif kind == "gen_aggregated_proof_request":
            r = msg.gen_aggregated_proof_request
            try:
                p1 = self._result_of(r.recursive_proof_1)
                p2 = self._result_of(r.recursive_proof_2)
                rid = self._submit("genAggregatedProof", (p1, p2))
                out.gen_aggregated_proof_response.id = rid
                out.gen_aggregated_proof_response.result = pb.RESULT_OK
            except Exception as e:  # noqa: BLE001
                zklog.error(f"genAggregatedProof: {e}")
                out.gen_aggregated_proof_response.result = pb.RESULT_ERROR
        elif kind == "gen_final_proof_request":
            try:
                p = self._result_of(msg.gen_final_proof_request.recursive_proof)
                rid = self._submit("genFinalProof", p)
                out.gen_final_proof_response.id = rid
                out.gen_final_proof_response.result = pb.RESULT_OK
            except Exception as e:  # noqa: BLE001
                zklog.error(f"genFinalProof: {e}")
                out.gen_final_proof_response.result = pb.RESULT_ERROR
        elif kind == "cancel_request":
            out.cancel_response.result = pb.RESULT_OK
        elif kind == "get_proof_request":
            out.get_proof_response.CopyFrom(
                self._get_proof(msg.get_proof_request))
        return out

    def _status(self) -> pb.GetStatusResponse:
        cur = self.prover.current
        return pb.GetStatusResponse(
            status=(pb.GetStatusResponse.STATUS_COMPUTING if cur
                    else pb.GetStatusResponse.STATUS_IDLE),
            current_computing_request_id=cur.uuid if cur else "",
            version_proto=PROTO_VERSION,
            version_server=SERVER_VERSION,
            prover_name=self.prover_name,
            prover_id=self.prover_name,
            fork_id=9,
        )

    def _parse_input(self, inp: pb.InputProver) -> ProofInput:
        pub_d = json.loads(inp.public_inputs_json) if inp.public_inputs_json else {}
        acts_d = json.loads(inp.actions_json) if inp.actions_json else {}
        return ProofInput(
            publics=PublicInputs(**pub_d),
            actions=BatchActions(
                binary=acts_d.get("binary", []),
                memory=acts_d.get("memory", []),
                arith=acts_d.get("arith", []),
            ),
            db=dict(inp.db),
            contracts_bytecode=dict(inp.contracts_bytecode),
        )

    def _submit(self, rtype: str, payload) -> str:
        req = ProverRequest(rtype, payload)
        self._requests[req.uuid] = req
        self.prover.submit_request(req)
        return req.uuid

    def _result_of(self, rid: str):
        req = self._requests.get(rid)
        assert req is not None, f"unknown proof id {rid}"
        req.done.wait()
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def _get_proof(self, req) -> pb.GetProofResponse:
        r = self._requests.get(req.id)
        if r is None:
            return pb.GetProofResponse(
                id=req.id, status=pb.GetProofResponse.STATUS_ERROR)
        if not r.done.is_set():
            return pb.GetProofResponse(
                id=req.id, status=pb.GetProofResponse.STATUS_PENDING)
        if r.error:
            return pb.GetProofResponse(
                id=req.id, status=pb.GetProofResponse.STATUS_COMPLETED_ERROR,
                result_string=r.error)
        payload = json.dumps(_summarize(r.result))
        return pb.GetProofResponse(
            id=req.id, status=pb.GetProofResponse.STATUS_COMPLETED_OK,
            proof_json=payload)


def _summarize(result) -> dict:
    """Wire summary of a proof result (publics + structural info)."""
    pub = dataclasses.asdict(result.publics)
    d = {"publics": pub, "type": type(result).__name__}
    if hasattr(result, "sm_proofs"):
        d["sms"] = sorted(result.sm_proofs)
    if hasattr(result, "publics_digest"):
        d["publicsDigest"] = hex(result.publics_digest)
    return d


# ---------------------------------------------------------------------------
# aggregator side (test/mock server driving the pipeline)
# ---------------------------------------------------------------------------


class MockAggregatorServer:
    """Drives a connected prover through batch -> batch -> aggregated ->
    final over real localhost gRPC (the reference test aggregator's role)."""

    def __init__(self, port: int, inputs: list[ProofInput]):
        self.inputs = inputs
        self.result: dict | None = None
        self.error: str | None = None
        self.done = threading.Event()
        self._server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
        register(self._server, SERVICE,
                 {"Channel": stream_stream(self._channel, pb.ProverMessage)})
        self.port = self._server.add_insecure_port(f"127.0.0.1:{port}")
        self._server.start()

    def stop(self):
        self._server.stop(0.5)

    # The handler is a generator: `yield` sends to the prover, reading from
    # request_iterator receives its replies (one reply per sent message).
    def _channel(self, request_iterator, context):
        try:
            mid = 0

            def call(setter):
                nonlocal mid
                mid += 1
                m = pb.AggregatorMessage(id=str(mid))
                setter(m)
                return m

            # 1. status
            yield call(lambda m: m.get_status_request.SetInParent())
            resp = next(request_iterator)
            assert resp.get_status_response.status in (
                pb.GetStatusResponse.STATUS_IDLE,
                pb.GetStatusResponse.STATUS_COMPUTING,
            )

            # 2. batch proofs
            proof_ids = []
            for inp in self.inputs:
                def set_batch(m, inp=inp):
                    m.gen_batch_proof_request.input.public_inputs_json = (
                        json.dumps(dataclasses.asdict(inp.publics)))
                    m.gen_batch_proof_request.input.actions_json = json.dumps({
                        "binary": inp.actions.binary,
                        "memory": inp.actions.memory,
                        "arith": inp.actions.arith,
                    })
                yield call(set_batch)
                resp = next(request_iterator)
                assert resp.gen_batch_proof_response.result == pb.RESULT_OK
                proof_ids.append(resp.gen_batch_proof_response.id)

            # 3. wait for completion via GetProof polling
            for pid in proof_ids:
                while True:
                    yield call(lambda m, pid=pid: setattr(
                        m.get_proof_request, "id", pid))
                    resp = next(request_iterator)
                    st = resp.get_proof_response.status
                    if st == pb.GetProofResponse.STATUS_COMPLETED_OK:
                        break
                    assert st == pb.GetProofResponse.STATUS_PENDING, st
                    time.sleep(0.2)

            # 4. aggregate (binary tree reduction step)
            agg_id = None
            if len(proof_ids) >= 2:
                def set_agg(m):
                    m.gen_aggregated_proof_request.recursive_proof_1 = proof_ids[0]
                    m.gen_aggregated_proof_request.recursive_proof_2 = proof_ids[1]
                yield call(set_agg)
                resp = next(request_iterator)
                assert resp.gen_aggregated_proof_response.result == pb.RESULT_OK
                agg_id = resp.gen_aggregated_proof_response.id

            # 5. final proof
            final_src = agg_id or proof_ids[0]
            yield call(lambda m: setattr(
                m.gen_final_proof_request, "recursive_proof", final_src))
            resp = next(request_iterator)
            assert resp.gen_final_proof_response.result == pb.RESULT_OK
            final_id = resp.gen_final_proof_response.id

            while True:
                yield call(lambda m: setattr(m.get_proof_request, "id", final_id))
                resp = next(request_iterator)
                st = resp.get_proof_response.status
                if st == pb.GetProofResponse.STATUS_COMPLETED_OK:
                    self.result = json.loads(resp.get_proof_response.proof_json)
                    break
                assert st == pb.GetProofResponse.STATUS_PENDING, st
                time.sleep(0.2)
        except Exception as e:  # noqa: BLE001 — surface to the test
            self.error = f"{type(e).__name__}: {e}"
        finally:
            self.done.set()
