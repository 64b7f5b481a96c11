"""STARK-in-STARK recursion: the verifier-as-circuit layer.

Reference roles: c12a (verifier normalized to a PLONKish AIR),
recursive1 (one proof verified in a STARK), recursive2 (two proofs of
one fixed shape verified in one STARK — the constant-size aggregation
join, prover.cpp:676-800).

Default tier: synthesize the verifier circuit of a real (tiny) proof and
check the compiled AIR is satisfied and rejects forgeries. ZK_SLOW: the
full outer prove -> verify, and the recursive2 pair join.
"""

import os

import numpy as np
import pytest

from zkevm_prover_tpu.ops import goldilocks as gl
from zkevm_prover_tpu.stark import expr as ex
from zkevm_prover_tpu.stark import gl_circuit as glc
from zkevm_prover_tpu.stark.air import AIR
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.recursive import (Recursive2Prover,
                                              RecursiveProver)
from zkevm_prover_tpu.stark.setup import StarkSetup
from zkevm_prover_tpu.stark.verifier import verify

N_BITS, N = 6, 64

_cache: dict = {}


def _fib_air():
    air = AIR("fib", N_BITS)
    a, b = air.committed("a", "b")
    nl = np.ones(N, dtype=np.uint64)
    nl[N - 1] = 0
    NL = air.constant("NOT_LAST", nl)
    p0 = air.public("a0", a, 0)
    air.require_zero(NL * (ex.Cm(a.id, True) - b))
    air.require_zero(NL * (ex.Cm(b.id, True) - (a + b)))
    air.require_zero(air.lagrange_first() * (a - p0))
    return air


def _inner():
    if "inner" not in _cache:
        tr = np.zeros((N, 2), dtype=np.uint64)
        x, y = 1, 1
        for i in range(N):
            tr[i] = (x, y)
            x, y = y, (x + y) % gl.P
        setup = StarkSetup(_fib_air(), n_queries=4, fri_fold_bits=2)
        pv = StarkProver(setup)
        proof = pv.prove(tr)
        assert verify(setup, pv.verkey, proof)
        _cache["inner"] = (setup, pv, proof, tr)
    return _cache["inner"]


def _r1():
    if "r1" not in _cache:
        setup, pv, proof, _ = _inner()
        rp = RecursiveProver(setup, n_bits=13, n_queries=4)
        s = rp._synth(pv.verkey, proof)
        cc = glc.compile_air(s, 13)
        opv = StarkProver(StarkSetup(cc.air, n_queries=4, fri_fold_bits=2))
        _cache["r1"] = (rp, s, cc, opv)
    return _cache["r1"]


def test_verifier_circuit_satisfied():
    _, s, cc, opv = _r1()
    stacked = cc.air.stack_traces(cc.trace(s))
    assert opv.check_constraints(stacked, quick=True) == []
    # the circuit publics are [inner publics..., inner verkey]
    _, pv, proof, _ = _inner()
    pubs = [s.vals[sig] for sig in s.publics]
    assert pubs[0] == int(proof.publics[0])
    assert pubs[1:5] == [int(v) for v in np.ravel(np.asarray(pv.verkey))]


def test_verifier_circuit_rejects_forged_wire():
    _, s, cc, opv = _r1()
    stacked = cc.air.stack_traces(cc.trace(s)).copy()
    stacked[100, 3] = (int(stacked[100, 3]) + 1) % gl.P
    assert opv.check_constraints(stacked, quick=True) != []


def test_verifier_circuit_rejects_forged_hash_claim():
    _, s, cc, opv = _r1()
    traces = cc.trace(s)
    g = traces["gates"].copy()
    base = cc.layout["base"]
    # tamper a Poseidon output lane on the first hash-claim row: the
    # PoseidonG lookup must reject it
    g[base, glc.N_WIRES + 12] = (int(g[base, glc.N_WIRES + 12]) + 1) % gl.P
    traces["gates"] = g
    stacked = cc.air.stack_traces(traces)
    assert opv.check_constraints(stacked, quick=True) != []


def test_bad_inner_proof_has_no_witness():
    """A tampered inner proof cannot even be witnessed: the transcript
    replay diverges and some gate/claim assertion fires."""
    import dataclasses

    setup, pv, proof, _ = _inner()
    bad = dataclasses.replace(proof, publics=[int(proof.publics[0]) + 1])
    rp = RecursiveProver(setup, n_bits=13, n_queries=4)
    with pytest.raises(AssertionError):
        rp._synth(pv.verkey, bad)


@pytest.mark.skipif(not os.environ.get("ZK_SLOW"),
                    reason="outer prove is ZK_SLOW on a CPU host")
def test_recursive1_prove_verify():
    setup, pv, proof, _ = _inner()
    rp = RecursiveProver(setup, n_bits=13, n_queries=4)
    rec = rp.prove_one(pv.verkey, proof)
    opv = rp.outer_prover
    assert verify(opv.setup, opv.verkey, rec.proof)
    assert [int(v) for v in rec.proof.publics[1:5]] == \
        [int(v) for v in np.ravel(np.asarray(pv.verkey))]


@pytest.mark.skipif(not os.environ.get("ZK_SLOW"),
                    reason="recursive2 needs two outer proves")
def test_recursive2_pair_join():
    setup, pv, proof, tr = _inner()
    rp = RecursiveProver(setup, n_bits=13, n_queries=4)
    r1a = rp.prove_one(pv.verkey, proof)
    r1b = rp.prove_one(pv.verkey, proof)
    opv = rp.outer_prover

    r2 = Recursive2Prover(
        opv.setup, opv.verkey, n_bits=15,
        join_publics=lambda p1, p2: [p1[0], p2[0]],
        chain=[], n_queries=4)
    outer = r2.prove_pair(r1a.proof, opv.verkey, r1b.proof, opv.verkey)
    o2 = r2.outer_prover
    assert verify(o2.setup, o2.verkey, outer)
    # the vk public carries recursive2's own verkey (the reference's
    # publics[44..47] invariant) — the closure point of the tree
    got_vk = [int(v) for v in outer.publics[-4:]]
    assert got_vk == [int(v) for v in np.ravel(np.asarray(o2.verkey))]
