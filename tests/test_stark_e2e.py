"""End-to-end eSTARK tests: AIRs with every argument kind, prove -> verify,
and tamper-rejection. The shape of the reference's zkProverTest
(test/prover/main.cpp: run genProof on saved pols, check against the JS
verifier) — here our own verifier (stark/verifier.py) is the oracle."""

import numpy as np
import pytest

from zkevm_prover_tpu.ops import goldilocks as gl
from zkevm_prover_tpu.stark import expr as ex
from zkevm_prover_tpu.stark.air import AIR
from zkevm_prover_tpu.stark.prover import StarkProver, calculate_h1h2, calculate_z
from zkevm_prover_tpu.stark.setup import StarkSetup
from zkevm_prover_tpu.stark.proof import StarkProof
from zkevm_prover_tpu.stark.verifier import VerifyError, verify

N_BITS = 6
N = 1 << N_BITS


def fib_air():
    """a' = b, b' = a + b with cyclic wrap disabled via L_last selector."""
    air = AIR("fib", N_BITS)
    a, b = air.committed("a", "b")
    not_last = np.ones(N, dtype=np.uint64)
    not_last[N - 1] = 0
    nl = air.constant("NOT_LAST", not_last)
    p0 = air.public("a0", a, 0)
    air.require_zero(nl * (ex.Cm(a.id, True) - b))
    air.require_zero(nl * (ex.Cm(b.id, True) - (a + b)))
    air.require_zero(air.lagrange_first() * (a - p0))
    return air


def fib_trace():
    tr = np.zeros((N, 2), dtype=np.uint64)
    x, y = 1, 1
    for i in range(N):
        tr[i] = (x, y)
        x, y = y, (x + y) % gl.P
    return tr


def lookup_air():
    """committed f-column constrained to take values from a constant table."""
    air = AIR("lk", N_BITS)
    f = air.committed("f")
    table = air.constant("T", np.arange(N, dtype=np.uint64) * 3)
    air.lookup([f], [table])
    return air


def lookup_trace(rng):
    vals = rng.integers(0, N, N).astype(np.uint64) * 3
    return vals.reshape(N, 1)


def permutation_air():
    air = AIR("pe", N_BITS)
    a, b = air.committed("a", "b")
    air.permutation([a], [b])
    return air


def permutation_trace(rng):
    a = rng.integers(0, gl.P, N, dtype=np.uint64)
    b = a[rng.permutation(N)]
    return np.stack([a, b], axis=1)


def connection_air_trace(rng):
    """copy constraint a[i] == b[sigma-partner(i)] via PLONK sigmas."""
    air = AIR("ci", N_BITS)
    a, b = air.committed("a", "b")
    # pair each row i of a with row (i+1) % N of b (a cyclic copy relation)
    vals = rng.integers(0, gl.P, N, dtype=np.uint64)
    ta = vals
    tb = np.roll(vals, 1)  # b[i+1] = a[i], closing each (0,i)-(1,i+1) 2-cycle
    # sigma encoding: position (0, i) <-> position (1, (i+1) % N) swapped
    w = gl.w(N_BITS)
    k0, k1 = 1, gl.shift()
    dom = np.array([pow(w, i, gl.P) for i in range(N)], dtype=object)
    s_a = np.array([(k1 * dom[(i + 1) % N]) % gl.P for i in range(N)], dtype=np.uint64)
    s_b = np.array([(k0 * dom[(i - 1) % N]) % gl.P for i in range(N)], dtype=np.uint64)
    sa = air.constant("Sa", s_a)
    sb = air.constant("Sb", s_b)
    air.connection([a, b], [sa, sb])
    return air, np.stack([ta, tb], axis=1)


def _roundtrip(air, trace, **kw):
    setup = StarkSetup(air, n_queries=8, fri_fold_bits=2, **kw)
    prover = StarkProver(setup)
    bad = prover.check_constraints(trace)
    assert bad == [], f"constraints violated: {bad}"
    proof = prover.prove(trace)
    assert verify(setup, prover.verkey, proof)
    return setup, prover, proof


# provers/proofs shared between tests of the same AIR (jitted phases are
# per-prover; re-tracing them for every test dominates suite wall-clock)
_cache: dict = {}


def _fib_rt():
    if "fib" not in _cache:
        _cache["fib"] = _roundtrip(fib_air(), fib_trace())
    return _cache["fib"]


def _lk_rt():
    if "lk" not in _cache:
        _cache["lk"] = _roundtrip(lookup_air(), lookup_trace(np.random.default_rng(7)))
    return _cache["lk"]


def test_fibonacci_roundtrip():
    _fib_rt()


def test_lookup_roundtrip():
    _lk_rt()


def test_permutation_roundtrip():
    _roundtrip(permutation_air(), permutation_trace(np.random.default_rng(8)))


def test_connection_roundtrip():
    air, trace = connection_air_trace(np.random.default_rng(9))
    _roundtrip(air, trace)


def test_proof_json_roundtrip():
    setup, prover, proof = _fib_rt()
    p2 = StarkProof.from_json(proof.to_json())
    assert verify(setup, prover.verkey, p2)


def test_tampered_trace_rejected():
    setup, prover, _ = _fib_rt()
    trace = fib_trace()
    trace[5, 0] = (int(trace[5, 0]) + 1) % gl.P
    assert prover.check_constraints(trace) != []
    proof = prover.prove(trace)
    with pytest.raises(VerifyError):
        verify(setup, prover.verkey, proof)


def test_tampered_proof_rejected():
    setup, prover, proof = _fib_rt()
    # 1. tamper an eval
    e = list(proof.evals)
    e[0] = ((e[0][0] + 1) % gl.P, e[0][1], e[0][2])
    import dataclasses
    bad = dataclasses.replace(proof, evals=e)
    with pytest.raises(VerifyError):
        verify(setup, prover.verkey, bad)
    # 2. tamper a merkle opening
    bad2 = StarkProof.from_json(proof.to_json())
    bad2.fri[0].queries[0][0].values[0] += 1
    with pytest.raises(VerifyError):
        verify(setup, prover.verkey, bad2)
    # 3. tamper the final polynomial
    bad3 = StarkProof.from_json(proof.to_json())
    bad3.final_pol[0, 0] = (int(bad3.final_pol[0, 0]) + 1) % gl.P
    with pytest.raises(VerifyError):
        verify(setup, prover.verkey, bad3)


def test_lookup_violation_detected():
    setup, prover, _ = _lk_rt()
    trace = lookup_trace(np.random.default_rng(7))
    trace[3, 0] = 1  # 1 is not a multiple of 3 -> not in table
    with pytest.raises(ValueError, match="plookup violation"):
        prover.prove(trace)


def test_h1h2_properties():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    t = rng.integers(0, 50, (N, 1)).astype(np.uint64)
    f = t[rng.integers(0, N, N)].reshape(N, 1)
    h1, h2, ok = calculate_h1h2(jnp.asarray(f), jnp.asarray(t))
    assert bool(ok)
    # multiset(h1 ++ h2) == multiset(f ++ t)
    got = sorted(np.concatenate([np.asarray(h1), np.asarray(h2)]).ravel().tolist())
    want = sorted(np.concatenate([f, t]).ravel().tolist())
    assert got == want


def test_calculate_z_wraps_to_one():
    import jax.numpy as jnp
    from zkevm_prover_tpu.ops import refmodel as rm
    rng = np.random.default_rng(4)
    num = rng.integers(1, gl.P, (N, 3), dtype=np.uint64)
    den = np.roll(num, 1, axis=0)  # same multiset -> total product 1
    z = calculate_z(jnp.asarray(num), jnp.asarray(den))
    zn = np.asarray(z)
    assert [int(v) for v in zn[0]] == [1, 0, 0]
    # wrap: z[N-1] * num[N-1] / den[N-1] == 1 (the zkassert of calculateZ)
    wrap = rm.mul3(tuple(int(v) for v in zn[-1]),
                   rm.mul3(tuple(int(v) for v in num[-1]),
                           rm.inv3(tuple(int(v) for v in den[-1]))))
    assert wrap == (1, 0, 0)
    # transition holds at a middle row
    mid = rm.mul3(tuple(int(v) for v in zn[9]),
                  rm.mul3(tuple(int(v) for v in num[9]),
                          rm.inv3(tuple(int(v) for v in den[9]))))
    assert mid == tuple(int(v) for v in zn[10])
