"""Recursion gadgets: in-circuit Poseidon-BN128, Merkle, GL arithmetic.

The tested foundation of the recursive verifier circuit
(docs/RECURSION.md); each gadget is checked against its host oracle and
one full circuit goes through Groth16 prove/verify.
"""

import random

import pytest

from zkevm_prover_tpu.ops import bn254, poseidon_bn128 as pbn
from zkevm_prover_tpu.ops import refmodel as rm
from zkevm_prover_tpu.snark import gadgets
from zkevm_prover_tpu.snark.gadgets import Synthesizer

R = bn254.R
P = gadgets.GL_P


def test_poseidon_gadget_matches_host():
    rng = random.Random(0)
    vals = [rng.randrange(R) for _ in range(pbn.T)]
    s = Synthesizer(n_public=0)
    state = [s.alloc(v) for v in vals]
    out = gadgets.poseidon_bn128_permute(s, state)
    r1cs, w = s.finish()
    assert r1cs.is_satisfied(w)
    expect = pbn.permute(vals)
    assert [w[o] for o in out] == expect

    # a corrupted witness must violate the constraints
    w2 = list(w)
    w2[out[0]] = (w2[out[0]] + 1) % R
    assert not r1cs.is_satisfied(w2)


def test_gl_arithmetic_gadgets():
    rng = random.Random(1)
    a_v, b_v = rng.randrange(P), rng.randrange(P)
    s = Synthesizer(n_public=0)
    a = s.alloc(a_v)
    b = s.alloc(b_v)
    m = gadgets.gl_mul(s, a, b)
    ad = gadgets.gl_add(s, a, b)
    a3 = [s.alloc(rng.randrange(P)) for _ in range(3)]
    b3 = [s.alloc(rng.randrange(P)) for _ in range(3)]
    c3 = gadgets.gl3_mul(s, a3, b3)
    r1cs, w = s.finish()
    assert r1cs.is_satisfied(w)
    assert w[m] == a_v * b_v % P
    assert w[ad] == (a_v + b_v) % P
    expect3 = rm.mul3(tuple(w[x] for x in a3), tuple(w[x] for x in b3))
    assert tuple(w[x] for x in c3) == tuple(expect3)

    # forged product caught by the range/decomposition constraints
    w2 = list(w)
    w2[m] = (w2[m] + 1) % R
    assert not r1cs.is_satisfied(w2)


def test_merkle_gadget_and_groth16_roundtrip():
    rng = random.Random(2)
    # two-level arity-16 tree built with the host hash
    leaves = [rng.randrange(R) for _ in range(256)]
    level1 = [pbn.hash16(leaves[i * 16:(i + 1) * 16]) for i in range(16)]
    root_v = pbn.hash16(level1)
    idx = 37
    l0, l1 = idx % 16, idx // 16

    s = Synthesizer(n_public=1)  # public: the root
    s.set_public(0, root_v)
    leaf = s.alloc(leaves[idx])
    sib0 = [s.alloc(leaves[l1 * 16 + j]) for j in range(16) if j != l0]
    sib1 = [s.alloc(level1[j]) for j in range(16) if j != l1]
    gadgets.merkle_path_arity16(s, leaf, [sib0, sib1], [l0, l1], root=1)
    r1cs, w = s.finish()
    assert r1cs.is_satisfied(w)

    # and the whole statement proves under Groth16
    from zkevm_prover_tpu.snark import groth16_prove, groth16_setup
    from zkevm_prover_tpu.snark import groth16_verify

    setup = groth16_setup(r1cs)
    proof = groth16_prove(setup, w)
    assert groth16_verify(setup, [root_v], proof)
    assert not groth16_verify(setup, [(root_v + 1) % R], proof)
