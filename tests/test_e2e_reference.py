"""End-to-end execution of the reference testvectors.

The fork_9 e2e vectors (testvectors/e2e/fork_9/input_executor_*.json) are
the reference's own acceptance tests: each carries a batch (batchL2Data,
db preimages, publics) and the expected newStateRoot.  Running the real
fork_9 rom.json through MainExecutor in process-batch mode must reproduce
the root bit-for-bit (reference: main_executor.cpp full-ROM execution).
"""

import os

import pytest

E2E = "/root/reference/testvectors/e2e/fork_9"
ROM = "/root/reference/src/main_sm/fork_9/scripts/rom.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ROM), reason="reference tree not mounted")


def _run(path):
    from zkevm_prover_tpu.executor import forks
    from zkevm_prover_tpu.executor.sm.main_sm import MainExecutor
    from zkevm_prover_tpu.hashdb.database import Database
    from zkevm_prover_tpu.hashdb.smt import Smt
    from zkevm_prover_tpu.prover.input import ProofInput

    pi = ProofInput.from_file(path)
    db = Database()
    pi.seed_database(db)
    rom = forks.rom_for_fork(int(pi.publics.fork_id))
    res = MainExecutor(rom, 23).execute(
        pi.executor_input(), smt=Smt(db), process_batch=True)
    got = 0
    for i, fe in enumerate(res.new_state_root):
        got |= int(fe) << (64 * i)
    return got, int(pi.publics.new_state_root, 16), res


@pytest.mark.parametrize("idx", [0, 1, 2, 3])
def test_e2e_vector_new_state_root(idx):
    got, want, res = _run(f"{E2E}/input_executor_{idx}.json")
    assert got == want, (
        f"newStateRoot mismatch: {got:#066x} != {want:#066x}")
    assert res.last_step > 1000  # a real execution, not a stub path
    assert res.counters["poseidonG"] > 0


@pytest.mark.parametrize("fork", [6, 7, 8])
def test_e2e_older_forks(fork):
    got, want, res = _run(
        f"/root/reference/testvectors/e2e/fork_{fork}/input_executor_0.json")
    assert got == want, (
        f"fork {fork} newStateRoot mismatch: {got:#066x} != {want:#066x}")


# the full e2e matrix (all four vectors of every shipped e2e fork) is
# slow-tier: each is an independent full-ROM execution
@pytest.mark.slow
@pytest.mark.parametrize("fork,idx", [(f, i) for f in (6, 7, 8)
                                      for i in (1, 2, 3)])
def test_e2e_older_forks_full_matrix(fork, idx):
    got, want, res = _run(
        f"/root/reference/testvectors/e2e/fork_{fork}/"
        f"input_executor_{idx}.json")
    assert got == want, (
        f"fork {fork} vec {idx}: {got:#066x} != {want:#066x}")


def test_e2e_counters_populated():
    _, _, res = _run(f"{E2E}/input_executor_0.json")
    for k in ("arith", "binary", "keccakF", "poseidonG", "paddingPG"):
        assert res.counters[k] > 0, f"counter {k} empty"


# timestampRecovery family (fork 7): real contract calls + the continuation
# flags — 0-0 is a 7-tx contract batch, 1-0 a changeL2Block-only batch with
# skipWriteBlockInfoRoot, 1-1 a skipFirstChangeL2Block continuation whose
# TIMESTAMP must be recovered from state (main_executor.cpp:249-289)
@pytest.mark.parametrize("vec", ["0-0", "0-1", "1-0", "1-1", "1-2", "1-3",
                                 "2-0"])
def test_timestamp_recovery_vectors(vec):
    got, want, res = _run(
        "/root/reference/testvectors/timestampRecovery/"
        f"block-info-batches-{vec}-input.json")
    assert got == want, (
        f"newStateRoot mismatch: {got:#066x} != {want:#066x}")
