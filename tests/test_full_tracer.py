"""FullTracer — EVM-level block/tx/log trace collection.

Reference: src/main_sm/fork_9/main/full_tracer.cpp driven by the zkROM's
eventLog commands; response shapes in src/prover/full_tracer_interface.hpp.
The executions below run real reference testvectors through the full ROM
with tracing enabled and check the response payloads.
"""

import os
import re

import pytest

REF = "/root/reference"
E2E = f"{REF}/testvectors/e2e/fork_9"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/src/main_sm/fork_9/scripts/rom.json"),
    reason="reference tree not mounted")


def _run_traced(path, trace_config=None):
    from zkevm_prover_tpu.executor import forks
    from zkevm_prover_tpu.executor.sm.main_sm import MainExecutor
    from zkevm_prover_tpu.hashdb.database import Database
    from zkevm_prover_tpu.hashdb.smt import Smt
    from zkevm_prover_tpu.prover.input import ProofInput

    pi = ProofInput.from_file(path)
    pi.trace_config = trace_config if trace_config is not None else {
        "enableMemory": True, "enableReturnData": True}
    db = Database()
    pi.seed_database(db)
    rom = forks.rom_for_fork(int(pi.publics.fork_id))
    tracer = pi.make_full_tracer(rom)
    MainExecutor(rom, 23).execute(
        pi.executor_input(), smt=Smt(db), process_batch=True,
        full_tracer=tracer)
    return pi, tracer


def test_opcode_table_matches_reference():
    """Our generated opcode table must equal the reference's 256-entry
    opcodeInfo (opcode_name.cpp) — names, canonical ids, and base gas."""
    from zkevm_prover_tpu.executor.full_tracer import opcode_name

    src = open(f"{REF}/src/main_sm/fork_9/main/opcode_name.cpp").read()
    entries = re.findall(r'\{\s*(0x[0-9a-fA-F]+),\s*"(\w+)",\s*(\d+)\s*\}',
                         src)
    assert len(entries) == 256
    for i, (op, name, gas) in enumerate(entries):
        assert opcode_name(i) == (int(op, 16), name, int(gas)), f"id {i:#x}"


def test_string_increment():
    from zkevm_prover_tpu.executor.full_tracer import string_increment

    assert string_increment(b"", b"abcd") == (0, 4)
    assert string_increment(b"abcd", b"abcd") == (0, 0)
    assert string_increment(b"abcd", b"abxd") == (2, 1)
    assert string_increment(b"abcd", b"abcdef") == (4, 2)
    # different lengths: tail runs to the end of the new string
    assert string_increment(b"abcd", b"xbcdef") == (0, 6)


def test_transfer_batch_trace():
    """e2e vector 0 (one ether transfer): block + tx payload fields
    (full_tracer.cpp onProcessTx/onFinishTx/onFinishBlock/onFinishBatch)."""
    pi, tracer = _run_traced(f"{E2E}/input_executor_0.json")
    ft = tracer.final_trace
    assert not ft.invalid_batch and ft.error == ""
    assert ft.new_state_root == pi.publics.new_state_root
    assert len(ft.block_responses) == 1
    blk = ft.block_responses[0]
    assert blk.block_number == 1
    assert blk.coinbase == pi.publics.sequencer_addr.lower()
    assert blk.block_hash == ft.new_state_root  # SR at block end
    assert blk.gas_used == 21000 and ft.gas_used == 21000
    assert len(blk.responses) == 1
    tx = blk.responses[0]
    assert tx.status == 1 and tx.error == ""
    assert tx.gas_used == 21000 and tx.cumulative_gas_used == 21000
    assert re.fullmatch(r"0x[0-9a-f]{64}", tx.tx_hash)
    assert re.fullmatch(r"0x[0-9a-f]{64}", tx.tx_hash_l2)
    assert re.fullmatch(r"0x[0-9a-f]{40}", tx.context.from_)
    assert tx.context.type == "CALL"
    assert tx.block_hash == blk.block_hash
    # ether transfer: the lone STOP is suppressed (full_tracer.cpp:2123-2138)
    assert tx.steps == []
    # touched-state summary has sender + receiver + system contracts
    assert tx.context.from_ in tracer.read_write_addresses
    assert tx.context.to in tracer.read_write_addresses


def test_contract_call_trace_steps():
    """timestampRecovery vector (fork 7, 7 contract calls): opcode steps,
    per-step gas accounting, and memory/stack capture."""
    path = f"{REF}/testvectors/timestampRecovery/block-info-batches-0-0-input.json"
    pi, tracer = _run_traced(path)
    ft = tracer.final_trace
    assert ft.new_state_root == pi.publics.new_state_root
    blk = ft.block_responses[0]
    assert len(blk.responses) == 7
    assert blk.gas_used == sum(r.gas_used for r in blk.responses)
    assert blk.gas_used == ft.gas_used
    total_steps = 0
    for tx in blk.responses:
        assert tx.status == 1
        assert tx.steps, "contract call must record opcodes"
        total_steps += len(tx.steps)
        names = {s.opcode for s in tx.steps}
        assert "MSTORE" in names and "JUMPI" in names
        for s in tx.steps:
            assert s.gas_cost >= 0
            assert s.depth == 1
            assert re.fullmatch(r"[0-9a-f]{40}", s.contract.address)
        # gas telescopes: each step's gas is previous minus its cost
        for a, b in zip(tx.steps, tx.steps[1:]):
            if a.depth == b.depth:
                assert a.gas - a.gas_cost == b.gas
    assert total_steps > 300


def test_trace_disabled_keeps_payload_small():
    """With no traceConfig the full_trace steps stay empty but the tx/block
    responses are still built (bGenerateFullTrace default, trace_config.hpp)."""
    pi, tracer = _run_traced(f"{E2E}/input_executor_0.json", trace_config={})
    ft = tracer.final_trace
    assert ft.new_state_root == pi.publics.new_state_root
    tx = ft.block_responses[0].responses[0]
    assert tx.gas_used == 21000
    assert tx.steps == []
    # stack/memory capture is off without enable flags
    assert tracer.cfg.generate_stack is False


def test_legacy_tx_hash_rlp():
    from zkevm_prover_tpu.executor.full_tracer import legacy_tx_hash
    from zkevm_prover_tpu.ops import keccak as k

    # structural: rlp list header + keccak over exactly the returned bytes
    h, rlp_tx = legacy_tx_hash(
        to="0x4d5cf5032b2a844602278b01199ed191a86c93ff", value=10**18,
        nonce=0, gas_limit=21000, gas_price=10**9, data="0x",
        r=0x1C8, s=0x2A, v=2037)
    assert h == "0x" + k.keccak256(rlp_tx).hex()
    assert rlp_tx[0] >= 0xC0  # list header
    # zero-valued ints encode as empty strings (0x80), single low bytes as-is
    h2, rlp2 = legacy_tx_hash("0x", 0, 0, 0, 0, "0x", 0, 0, 0)
    assert rlp2 == bytes([0xC0 + 9] + [0x80] * 9)
