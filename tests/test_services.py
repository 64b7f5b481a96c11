"""gRPC services over real localhost sockets.

Mirrors the reference's multi-node-without-a-cluster test (SURVEY.md §4.5:
config_runFile_e2e runs the aggregator server AND client in one process):
HashDB server/remote-client parity, Executor ProcessBatch, and the full
aggregator channel driving batch -> batch -> aggregated -> final.
"""

import json
import random

import pytest

from zkevm_prover_tpu.executor import BatchActions
from zkevm_prover_tpu.hashdb import Database, HashDB, Smt
from zkevm_prover_tpu.prover import ProofInput, Prover, PublicInputs
from zkevm_prover_tpu.services import (
    AggregatorClient, ExecutorClient, HashDBClient, MockAggregatorServer,
    serve_executor, serve_hashdb,
)

ZERO = (0, 0, 0, 0)


def test_hashdb_service_roundtrip():
    server = serve_hashdb(58061)
    try:
        client = HashDBClient("127.0.0.1:58061")
        rng = random.Random(0)
        key = tuple(rng.getrandbits(63) for _ in range(4))
        r = client.set("", 0, ZERO, key, 1234)
        assert r.mode == "insertNotFound"
        g = client.get("", r.new_root, key)
        assert g.value == 1234
        # remote result must equal a local Smt over the same semantics
        local = Smt(Database()).set(ZERO, key, 1234)
        assert local.new_root == r.new_root
        # programs
        pkey = (1, 2, 3, 4)
        client.set_program("", pkey, b"\x60\x01")
        assert client.get_program("", pkey) == b"\x60\x01"
        st = client.get_flush_status()
        assert "lastFlushId" in st

        # extended surface (reference hashdb_service.cpp RPC set)
        assert client.get_latest_state_root() == r.new_root
        client.start_block("blk", r.new_root)
        client.finish_tx("blk", r.new_root)
        client.finish_block("blk", r.new_root)
        client.purge("blk", r.new_root)
        root2, fid, stored = client.consolidate_state(r.new_root)
        assert root2 == r.new_root
        entries = client.read_tree(r.new_root, [key])
        assert entries[0]["value"] == 1234
        data = client.get_flush_data(0)
        assert len(data["nodes"]) > 0
        # LoadDB round-trip into a fresh server
        server2 = serve_hashdb(58062)
        try:
            client2 = HashDBClient("127.0.0.1:58062")
            client2.load_db(data["nodes"])
            g2 = client2.get("", r.new_root, key)
            assert g2.value == 1234
            client2.reset_db()
            import grpc as _grpc
            try:
                client2.get("", r.new_root, key)
                assert False, "expected failure after ResetDB"
            except Exception:
                pass
        finally:
            server2.stop(0)
    finally:
        server.stop(0)


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"),
    reason="reference tree not mounted")
def test_executor_service_reference_vector(shared_prover):
    """ProcessBatch over real gRPC with a reference e2e vector: the full
    ROM runs server-side and the response carries the FullTracer's
    block/tx payloads (executor_service.cpp ProcessBatchV2 parity)."""
    pi = ProofInput.from_file(
        "/root/reference/testvectors/e2e/fork_9/input_executor_0.json")
    server = serve_executor(58074, shared_prover)
    try:
        client = ExecutorClient("127.0.0.1:58074")
        resp = client.process_batch_input(
            pi, trace_config={"enableMemory": True})
        assert resp.error == 0
        assert resp.new_state_root == pi.publics.new_state_root
        assert resp.error_rom == 1 and resp.invalid_batch == 0  # NO_ERROR
        assert resp.fork_id == 9
        assert len(resp.block_responses) == 1
        blk = resp.block_responses[0]
        assert blk.block_number == 1 and blk.gas_used == 21000
        assert blk.block_hash.hex() == pi.publics.new_state_root[2:]
        tx = blk.responses[0]
        assert tx.status == 1 and tx.gas_used == 21000
        assert len(tx.tx_hash) == 32 and len(tx.rlp_tx) > 64
        assert tx.full_trace.context.gas == 100000 or \
            tx.full_trace.context.gas > 21000
        assert resp.gas_used == 21000
        assert resp.counters["poseidonG"] > 0
        assert len(resp.read_write_addresses) >= 2
        sender = getattr(tx.full_trace.context, "from")
        assert sender in resp.read_write_addresses
        # balances re-read at the final root are decimal strings
        assert resp.read_write_addresses[sender].balance.isdigit()
    finally:
        server.stop(0)


def test_executor_service_process_batch(shared_prover):
    server = serve_executor(58071, shared_prover)
    try:
        client = ExecutorClient("127.0.0.1:58071")
        resp = client.process_batch(
            old_batch_num=3,
            actions={"memory": [
                {"addr": 1, "step": 1, "wr": 1, "value": 9},
                {"addr": 1, "step": 2, "wr": 0, "value": 0},
            ]},
        )
        assert resp.error == 0
        assert resp.new_batch_num == 4
        assert resp.counters["memory"] == 2
        # malformed root is rejected with error (reference input validation)
        bad = client.process_batch(old_state_root="nothex")
        assert bad.error == 1
        # the V2 wire name a real sequencer dials (executor.proto:12)
        resp2 = client.process_batch_v2(
            old_batch_num=3,
            actions_json='{"memory": [{"addr": 1, "step": 1, "wr": 1, '
                         '"value": 9}, {"addr": 1, "step": 2, "wr": 0, '
                         '"value": 0}]}')
        assert resp2.error == 0 and resp2.new_batch_num == 4
    finally:
        server.stop(0)


@pytest.fixture(scope="module")
def shared_prover():
    # digest final mode keeps the gRPC e2e fast; the production default
    # (stark-verify) is covered by test_prover_pipeline
    return Prover(n_bits=9, final_snark="digest")


def _chain_inputs():
    i1 = ProofInput(
        publics=PublicInputs(batch_l2_data="0x01"),
        actions=BatchActions(memory=[
            {"addr": 1, "step": 1, "wr": 1, "value": 5},
            {"addr": 1, "step": 2, "wr": 0, "value": 0},
        ]),
    )
    # compute the chained publics of batch 2 the way the prover will
    p = PublicInputs(batch_l2_data="0x01")
    i2 = ProofInput(
        publics=PublicInputs(
            old_state_root=p.old_state_root,
            old_acc_input_hash=p.acc_input_hash(),
            old_batch_num=1,
            batch_l2_data="0x02",
        ),
        actions=BatchActions(memory=[
            {"addr": 2, "step": 1, "wr": 1, "value": 6},
            {"addr": 2, "step": 2, "wr": 0, "value": 0},
        ]),
    )
    return [i1, i2]


def test_aggregator_channel_end_to_end(shared_prover):
    server = MockAggregatorServer(58081, _chain_inputs())
    client = AggregatorClient(shared_prover, f"127.0.0.1:{server.port}",
                              watchdog_timeout_s=120.0).start()
    try:
        assert server.done.wait(timeout=600), "aggregator flow timed out"
        assert server.error is None, server.error
        assert server.result is not None
        assert server.result["type"] == "FinalProof"
        assert server.result["publics"]["new_batch_num"] == 2
        assert "publicsDigest" in server.result
    finally:
        client.stop()
        server.stop()


_stateless_cache: dict = {}


def _stateless_fixture():
    """(witness blob, data stream, root after stage 1) — stage 1 executes
    a changeL2Block batch from the empty state through the real ROM, then
    encodes the touched state as a semantic-leaf witness."""
    if _stateless_cache:
        return _stateless_cache["fix"]
    from zkevm_prover_tpu.executor import forks
    from zkevm_prover_tpu.executor.sm.main_sm import MainExecutor
    from zkevm_prover_tpu.hashdb.database import Database
    from zkevm_prover_tpu.hashdb.smt import Smt
    from zkevm_prover_tpu.prover import datastream, witness

    batch = datastream.DataStreamBatch(batch_number=4, fork_id=9,
                                       chain_id=1101)
    blk = datastream.DataStreamBlock(
        block_number=10, timestamp=1700, delta_timestamp=1,
        l1_info_tree_index=0, l1_block_hash=b"\0" * 32,
        global_exit_root=b"\0" * 32, coinbase=b"\x0a" * 20,
        fork_id=9, chain_id=1101)
    batch.blocks = [blk]
    stream = datastream.encode(batch)
    l2 = datastream.batch_to_l2_data(batch)

    smt = Smt(Database())
    rom = forks.rom_for_fork(9)
    inp1 = ProofInput(publics=PublicInputs(
        old_state_root="0x" + "00" * 32, old_batch_num=3, chain_id=1101,
        fork_id=9, batch_l2_data="0x" + l2.hex(), timestamp_limit=2000,
        sequencer_addr="0x" + "0a" * 20))
    res1 = MainExecutor(rom, 23).execute(
        inp1.executor_input(), smt=smt, process_batch=True)
    root1 = res1.new_state_root
    assert root1 != (0, 0, 0, 0)

    leaves = {}
    for a in res1.actions.storage:
        v = smt.get(root1, a["key"]).value
        if v:
            leaves[a["key"]] = (a["key_type"], a["addr"], a["slot"], v)
    blob = witness.db_to_witness(smt.db, root1, leaves=leaves)
    _stateless_cache["fix"] = (blob, stream, root1)
    return _stateless_cache["fix"]


def test_executor_stateless_batch(shared_prover):
    """Stateless ProcessBatch: replay the next batch from witness + data
    stream over gRPC — the reference's ProcessStatelessBatchV2 flow
    (executor_service.cpp:1716)."""
    blob, stream, root1 = _stateless_fixture()

    server = serve_executor(58072, shared_prover)
    try:
        client = ExecutorClient("127.0.0.1:58072")
        resp = client.process_stateless_batch(
            witness=blob, data_stream=stream, old_batch_num=4,
            timestamp_limit=2000, v2=True)
        assert resp.error == 0
        assert resp.new_batch_num == 5
        assert resp.prover_id == "zkevm-prover-tpu"
        # the replayed batch advanced the state and traced its block
        root1_hex = "0x" + format(
            sum(int(root1[i]) << (64 * i) for i in range(4)), "064x")
        assert resp.new_state_root != root1_hex
        assert len(resp.block_responses) == 1
        assert resp.error_rom == 1  # NO_ERROR
    finally:
        server.stop(0)


@pytest.mark.slow
def test_aggregator_stateless_batch_request(shared_prover):
    """GenStatelessBatchProof on the AGGREGATOR channel (reference
    aggregator.proto:32): the request handler reconstructs the batch
    input from witness + data stream and submits a genBatchProof.

    slow tier: a full ROM-path batch prove with its own AIR compile —
    ~15+ min cold on this 1-core host."""
    import aggregator_pb2 as apb
    from zkevm_prover_tpu.services.aggregator import AggregatorClient

    blob, stream, _ = _stateless_fixture()
    client = AggregatorClient(shared_prover, "127.0.0.1:1")  # no start()
    msg = apb.AggregatorMessage(id="sb-1")
    pi = msg.gen_stateless_batch_proof_request.input.public_inputs
    pi.witness = blob
    pi.data_stream = stream
    pi.timestamp_limit = 2000
    out = client._handle(msg)
    assert out.WhichOneof("response") == "gen_batch_proof_response"
    assert out.gen_batch_proof_response.result == apb.RESULT_OK
    rid = out.gen_batch_proof_response.id
    req = client._requests[rid]
    assert req.done.wait(timeout=2400), "stateless batch proof timed out"
    assert req.error is None, req.error
    assert req.result is not None
