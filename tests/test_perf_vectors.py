"""The reference performance workloads (testvectors/performance*).

Full runs are ~25 min each on this host (millions of ROM steps), so the
bit-exact full-batch checks are slow-tier; the default tier executes a
2-tx prefix and audits the touched balances analytically. Findings and
per-vector results: docs/PERF_VECTORS.md + artifacts/perf/*.json.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

PERF5 = "/root/reference/testvectors/performance"
PERF7 = "/root/reference/testvectors/performance_fork7"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PERF5), reason="reference tree not mounted")


def _execute(path, txs=0, bits=20, no_counters=False):
    from run_perf_vector import truncate_txs

    from zkevm_prover_tpu.executor import forks
    from zkevm_prover_tpu.executor.sm.main_sm import MainExecutor
    from zkevm_prover_tpu.hashdb.database import Database
    from zkevm_prover_tpu.hashdb.smt import Smt
    from zkevm_prover_tpu.prover.input import ProofInput

    pi = ProofInput.from_file(path)
    want = int(pi.publics.new_state_root, 16)
    if txs:
        data = truncate_txs(bytes.fromhex(pi.publics.batch_l2_data[2:]), txs)
        pi.publics.batch_l2_data = "0x" + data.hex()
        want = None
    if no_counters:
        pi.no_counters = True
    db = Database()
    pi.seed_database(db)
    rom = forks.rom_for_fork(int(pi.publics.fork_id))
    smt = Smt(db)
    tracer = pi.make_full_tracer(rom)
    res = MainExecutor(rom, bits).execute(
        pi.executor_input(), smt=smt, process_batch=True,
        full_tracer=tracer)
    got = 0
    for i, fe in enumerate(res.new_state_root):
        got |= int(fe) << (64 * i)
    return got, want, res, tracer, smt


def test_balance_transfer_prefix_executes():
    """2-tx prefix of the fork_7 balance-transfer workload: no batch
    error, sender pays exactly value+fee per tx (fees net zero: sender
    == sequencerAddr), nonce advances."""
    got, _, res, tracer, smt = _execute(
        f"{PERF7}/balance_transfer-730.json", txs=2)
    assert tracer.error == "" and not tracer.invalid_batch
    info = tracer.read_write_addresses[
        "0x617b3a3528f9cdd6630fd3301b9c8911f7bf063d"]
    assert int(info.nonce) == 2
    eth = 10 ** 18
    assert int(info.balance) == 100 * eth - 2 * (eth // 10)


def test_erc20_prefix_executes():
    """1-tx prefix of the fork_7 ERC-20 workload runs a real contract
    call: gas charged beyond intrinsic, no error."""
    got, _, res, tracer, _ = _execute(
        f"{PERF7}/erc20_transfer-197.json", txs=1)
    assert tracer.error == "" and not tracer.invalid_batch
    assert res.counters["keccakF"] > 0


@pytest.mark.slow
def test_fork5_balance_transfer_full_bit_exact():
    """The full 498-tx fork_5 workload reproduces the reference
    newStateRoot bit-for-bit (artifacts/perf/f5_balance_transfer.json
    records the standing result)."""
    got, want, res, tracer, _ = _execute(
        f"{PERF5}/balance_transfer-498.json", bits=23)
    assert got == want, f"{got:#066x} != {want:#066x}"


def test_artifact_results_recorded():
    """The committed per-vector artifacts exist and the fork_5 runs
    match (the standing evidence docs/PERF_VECTORS.md cites)."""
    root = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "perf")
    f5 = json.load(open(os.path.join(root, "f5_balance_transfer.json")))
    assert f5["match"] is True and f5["txs"] == 498
