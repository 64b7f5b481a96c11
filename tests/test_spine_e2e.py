"""The spine: ONE combined-AIR batch proof of a real reference e2e vector.

Reference: Prover::genBatchProof (prover.cpp:392-612) = Executor::execute
filling every SM's columns from the fork_9 ROM run, then one
Starks::genProof over the whole trace, publics threaded through the proof
(prover.cpp:494-560).

The tests parse testvectors/e2e/fork_9/input_executor_0.json, execute the
real fork_9 rom.json full-trace at 2^14, and check the combined AIR over
Main + Memory + Storage + PoseidonG + ClimbKey + MemAlign + Arith + the
PaddingPG pipeline:

  * the executed traces satisfy every constraint/lookup/permutation,
  * forged cross-SM values (memory value, storage value, poseidon
    counter) violate the combined constraints even when each forged SM
    stays internally consistent,
  * the committed spine proof artifact (artifacts/spine_fork9_2e14/,
    produced by tools/run_spine.py from this very vector) verifies and
    carries the vector's publics — old/new state root, the accInputHash
    recurrence, batch numbers.

Proof GENERATION at this scale is minutes of XLA compile on a CPU host,
so the default suite verifies the committed artifact and re-proves only
under ZK_SLOW=1 (tools/run_spine.py is the producer; the Binary SM joins
from 2^16 and the keccak/sha256 gate pipelines from 2^18 — the
production-shape run documented in artifacts/).
"""

import dataclasses
import json
import os

import numpy as np
import pytest

E2E = "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"
ROM = "/root/reference/src/main_sm/fork_9/scripts/rom.json"
ART = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "spine_fork9_2e14")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ROM), reason="reference tree not mounted")

_cache: dict = {}


def _setup():
    """Combined batch AIR + prover (no const commit — lazy init keeps this
    fast enough for the default suite)."""
    from zkevm_prover_tpu.executor import combined, forks
    from zkevm_prover_tpu.stark.prover import StarkProver
    from zkevm_prover_tpu.stark.setup import StarkSetup

    if "prover" not in _cache:
        rom = forks.rom_for_fork(9)
        air = combined.build_batch_air(
            rom, 14, include=combined.default_include(14))
        _cache["rom"] = rom
        _cache["prover"] = StarkProver(
            StarkSetup(air, n_queries=8, fri_fold_bits=2))
    return _cache["prover"]


def _traces():
    from zkevm_prover_tpu.executor import combined
    from zkevm_prover_tpu.hashdb.database import Database
    from zkevm_prover_tpu.hashdb.smt import Smt
    from zkevm_prover_tpu.prover.input import ProofInput

    if "traces" not in _cache:
        inp = ProofInput.from_file(E2E)
        db = Database()
        inp.seed_database(db)
        res, traces = combined.execute_batch(
            _cache["rom"], 14, input=inp.executor_input(), smt=Smt(db),
            include=combined.default_include(14))
        _cache["inp"] = inp
        _cache["traces"] = traces
        _cache["res"] = res
    return _cache["traces"]


def _forge(traces_mut):
    """Apply a mutation to the executed traces and return the violated
    combined-AIR constraint list (empty = forgery accepted = bug)."""
    prover = _setup()
    traces = {k: v.copy() for k, v in _traces().items()}
    traces_mut(traces)
    stacked = prover.setup.air.stack_traces(traces)
    return prover.check_constraints(stacked, quick=True)


def test_spine_traces_satisfy_combined_air():
    assert _forge(lambda traces: None) == []


def test_spine_rejects_forged_memory_value():
    def mut(traces):
        mem = traces["memory"]
        live = np.nonzero(mem.any(axis=1))[0]
        assert len(live) > 0
        mem[live[0], 6] = (int(mem[live[0], 6]) + 1) % 7

    assert _forge(mut) != []


def test_spine_rejects_forged_storage_value():
    from zkevm_prover_tpu.executor.sm import storage as storage_sm

    ci = {nm: i for i, nm in enumerate(storage_sm.COLS)}

    def mut(traces):
        st = traces["storage"]
        rows = np.nonzero(st[:, ci["START"]] * st[:, ci["OACT"]])[0]
        assert len(rows) > 0
        st[rows[0], ci["VLOW0"]] = (int(st[rows[0], ci["VLOW0"]]) + 1) % 7

    assert _forge(mut) != []


def test_spine_rejects_inflated_poseidon_counter():
    from zkevm_prover_tpu.executor.sm import main_sm

    cols = main_sm.columns(14)
    inccnt = cols.index("INCCNT")
    srd = cols.index("SRD")
    swr = cols.index("SWR")

    def mut(traces):
        m = traces["main"]
        rows = np.nonzero(m[:, srd] + m[:, swr])[0]
        assert len(rows) > 0
        # claim one extra PoseidonG permutation for a storage op
        m[rows[0], inccnt] = int(m[rows[0], inccnt]) + 1

    assert _forge(mut) != []


def test_spine_rejects_foreign_leaf_value_forgery():
    """A get-on-missing-key must not be claimable as FOUND with an
    arbitrary value: flipping FOUNDN on a foreign-leaf row trips the
    key-inequality witness constraints."""
    from zkevm_prover_tpu.executor.sm import storage as storage_sm

    ci = {nm: i for i, nm in enumerate(storage_sm.COLS)}

    def mut(traces):
        st = traces["storage"]
        foreign = np.nonzero(
            st[:, ci["NLEAF"]] * (1 - st[:, ci["FOUNDN"]]))[0]
        if len(foreign) == 0:
            pytest.skip("vector has no foreign-leaf action")
        st[foreign[0], ci["FOUNDN"]] = 1

    assert _forge(mut) != []


# -- the committed proof artifact -----------------------------------------


def _artifact():
    from zkevm_prover_tpu.stark.proof import StarkProof

    if not os.path.exists(os.path.join(ART, "proof.json")):
        pytest.skip("spine proof artifact not built (tools/run_spine.py)")
    with open(os.path.join(ART, "proof.json")) as f:
        proof = StarkProof.from_json(f.read())
    with open(os.path.join(ART, "meta.json")) as f:
        meta = json.load(f)
    return proof, meta


def test_spine_artifact_proof_verifies_with_real_publics():
    from zkevm_prover_tpu.prover.input import ProofInput
    from zkevm_prover_tpu.stark.verifier import verify

    proof, meta = _artifact()
    prover = _setup()
    inp = ProofInput.from_file(E2E)
    verkey = meta["verkey"]
    if os.environ.get("ZK_SLOW"):
        # recompute the const-tree root so the artifact is pinned to OUR
        # preprocessed columns (minutes of LDE+Merkle on a CPU host)
        assert [int(x) for x in np.asarray(prover.verkey).ravel()] == verkey
    assert verify(prover.setup, verkey, proof)

    pv = [int(x) for x in proof.publics]
    old_sr = sum(v << (32 * i) for i, v in enumerate(pv[0:8]))
    new_sr = sum(v << (32 * i) for i, v in enumerate(pv[19:27]))
    new_acc = sum(v << (32 * i) for i, v in enumerate(pv[27:35]))
    assert old_sr == int(inp.publics.old_state_root, 16)
    assert new_sr == int(inp.publics.new_state_root, 16)
    assert new_acc == int(inp.publics.acc_input_hash(), 16)
    assert new_acc == int(inp.publics.new_acc_input_hash, 16)
    assert pv[16] == 0 and pv[43] == 1      # oldBatchNum / newBatchNum
    assert pv[17] == 1000 and pv[18] == 9   # chainId / forkid


def test_spine_artifact_tampered_public_rejected():
    from zkevm_prover_tpu.stark.verifier import VerifyError, verify

    proof, meta = _artifact()
    prover = _setup()
    bad = dataclasses.replace(proof, publics=list(proof.publics))
    bad.publics[19] = int(bad.publics[19]) + 1
    try:
        ok = verify(prover.setup, meta["verkey"], bad)
    except VerifyError:
        ok = False
    assert not ok


@pytest.mark.skipif(not os.environ.get("ZK_SLOW"),
                    reason="full spine prove is ZK_SLOW")
def test_spine_prove_end_to_end():
    from zkevm_prover_tpu.prover.input import ProofInput
    from zkevm_prover_tpu.prover.prover import Prover
    from zkevm_prover_tpu.stark.verifier import verify

    pv = Prover(rom_bits=14)
    inp = ProofInput.from_file(E2E)
    bp = pv.gen_batch_proof(inp)
    prover, proof = bp.sm_proofs["batch"]
    assert verify(prover.setup, prover.verkey, proof)
    assert bp.publics.new_state_root == inp.publics.new_state_root
    assert bp.publics.new_acc_input_hash == inp.publics.new_acc_input_hash
