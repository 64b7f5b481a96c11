"""SHA-256 pipeline — gate circuit, Sha256F SM, PaddingSha256 SM."""

import hashlib

import numpy as np
import pytest

from zkevm_prover_tpu.executor.sm import (keccak_circuit as kc, padding_sha256,
                                          sha256_circuit, sha256_f)
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup

# reduced circuit for AIR tests: 8 rounds (~13.7k gate rows, one 2^14 slot)
ROUNDS = 8
PACK = 4
LIMB_BITS = 2
N_BITS = 14

_cache: dict = {}


def _circ(rounds=ROUNDS):
    key = ("c", rounds)
    if key not in _cache:
        _cache[key] = sha256_circuit.build(rounds)
    return _cache[key]


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(StarkSetup(
            sha256_f.build_air(N_BITS, _circ(), PACK, LIMB_BITS),
            n_queries=8, fri_fold_bits=2))
    return _cache["p"]


def test_full_circuit_matches_hashlib():
    circ = sha256_circuit.build(64)
    # single pre-padded block: "abc"
    msg = b"abc"
    padded = bytearray(msg) + bytearray(64 - len(msg))
    padded[3] = 0x80
    padded[-8:] = (8 * 3).to_bytes(8, "big")
    block = [int.from_bytes(padded[4 * i:4 * i + 4], "big")
             for i in range(16)]
    state = [int(v) for v in sha256_circuit.initial_state()]
    acts = [{"state": state, "block": block}]
    out = sha256_f.digests(circ, acts, pack=40)
    digest = b"".join(int(w).to_bytes(4, "big") for w in out[0])
    assert digest == hashlib.sha256(msg).digest()


def test_sha256_f_air_satisfied_and_tampering():
    circ = _circ()
    rng = np.random.default_rng(8)
    acts = [{"state": rng.integers(0, 1 << 32, 8, dtype=np.uint64),
             "block": rng.integers(0, 1 << 32, 16, dtype=np.uint64)}
            for _ in range(3)]
    trace = sha256_f.execute(acts, N_BITS, circ, PACK, LIMB_BITS)
    prover = _prover()
    bad = prover.check_constraints(trace, quick=True)
    assert bad == [], f"violated constraints: {bad}"

    m = 2  # limbs
    # break an AND gate's output
    t = trace.copy()
    and_rows = np.nonzero(circ.ops == kc.AND)[0]
    r = int(and_rows[0])
    t[r, 2 * m] ^= np.uint64(1)
    assert prover.check_constraints(t, quick=True) != []


def test_padding_sha256_digests_and_air():
    msgs = [{"data": b"hello sha"},
            {"data": bytes(range(100))},   # pad spills into a second block
            {"data": b""},
            {"data": bytes([5] * 56)}]     # suffix forces an extra block
    n_bits = 11
    trace, sha_actions, digests = padding_sha256.execute(msgs, n_bits)
    for a, d in zip(msgs, digests):
        assert d == padding_sha256.digest_of(a["data"])

    if "pp" not in _cache:
        _cache["pp"] = StarkProver(StarkSetup(
            padding_sha256.build_air(n_bits), n_queries=8, fri_fold_bits=2))
    prover = _cache["pp"]
    bad = prover.check_constraints(trace, quick=True)
    assert bad == [], f"violated constraints: {bad}"

    ci = {nm: i for i, nm in enumerate(padding_sha256.COLS)}
    # lie about the message length in the suffix
    t = trace.copy()
    suff_rows = np.nonzero((t[:, ci["LASTH"]] == 1)
                           & (t[:, ci["LENACC"]] > 0))[0]
    r = int(suff_rows[-1])
    t[r, ci["LENACC"]] += np.uint64(8)
    t[r, ci["BYTE"]] += np.uint64(1)
    assert prover.check_constraints(t, quick=True) != []

    # non-zero filler inside the pad
    t = trace.copy()
    pad_rows = np.nonzero((t[:, ci["PAD"]] == 1)
                          & (t[:, ci["PADFIRST"]] == 0)
                          & (t[:, ci["BYTE"]] == 0))[0]
    t[int(pad_rows[0]), ci["BYTE"]] = np.uint64(7)
    assert prover.check_constraints(t, quick=True) != []
