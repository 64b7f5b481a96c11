"""Cross-fork acceptance: the reference `testvectors/collection` suite.

The reference ships 4 executor inputs per fork under
`testvectors/collection/fork_{1..9}/` — the cross-fork regression family
its generated per-fork executors are validated against. One interpreter
(executor/sm/main_sm.py) + the fork's own rom.json
(src/main_sm/fork_N/scripts/rom.json) must reproduce every vector's
newStateRoot bit-for-bit (reference: main_executor.cpp per-fork trees,
selected by forkID in prover.cpp).

Pre-fork-7 vectors use the legacy publics (globalExitRoot + timestamp,
no l1InfoTree) — parsed by prover/input.py and fed to the ROM's
getGlobalExitRoot/getTimestamp free-input getters.

Default tier runs vector 0 of every fork (~30 s); the full 36-vector
sweep is ZK_SLOW.
"""

import os

import pytest

COLLECTION = "/root/reference/testvectors/collection"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(COLLECTION), reason="reference tree not mounted")


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


def test_all_nine_forks_have_roms():
    from zkevm_prover_tpu.executor import forks

    assert forks.supported_forks() == list(range(1, 10))


@pytest.mark.parametrize("fork", range(1, 10))
def test_collection_vector0_every_fork(fork):
    got, want, res = _run(f"{COLLECTION}/fork_{fork}/input_executor_0.json")
    assert got == want, (
        f"fork {fork} newStateRoot mismatch: {got:#066x} != {want:#066x}")
    assert res.last_step > 1000


@pytest.mark.slow
@pytest.mark.parametrize("fork", range(1, 10))
@pytest.mark.parametrize("idx", [1, 2, 3])
def test_collection_full_sweep(fork, idx):
    got, want, _ = _run(f"{COLLECTION}/fork_{fork}/input_executor_{idx}.json")
    assert got == want, (
        f"fork {fork} vec {idx}: {got:#066x} != {want:#066x}")


def test_fork6_accinputhash_formula():
    """The pre-etrog accInputHash recurrence (oldAcc || batchHashData ||
    globalExitRoot || timestamp || sequencerAddr) must reproduce the
    vector's newAccInputHash (reference rom.json batchHashData vars)."""
    from zkevm_prover_tpu.prover.input import ProofInput

    pi = ProofInput.from_file(
        f"{COLLECTION}/fork_6/input_executor_0.json")
    assert pi.publics.acc_input_hash() == pi.publics.new_acc_input_hash
