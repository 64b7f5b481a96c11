"""Poseidon permutation over BN254 Fr (width 17) — the recursiveF hasher.

Reference: src/poseidon_opt/ (`Poseidon_opt::hash`, poseidon_opt.hpp:27-28,
with a 24k-line circomlib constants header) hashing 16 Fr inputs + 1
capacity for the BN128 Merkle trees and transcript of the recursiveF stage
(BN128_ARITY 16, starkRecursiveF.hpp:22).

The permutation shape matches circomlib Poseidon (x^5 S-box, RF=8 full
rounds, RP=68 partial rounds at t=17). Constants are a deterministic
SHAKE-256 placeholder with the same `load_constants` drop-in hook as
poseidon-GL (the reference's exact circomlib constants are in the absent
artifact set); the MDS is a Cauchy matrix over Fr (provably MDS).

Host-side exact ints: the recursiveF stage hashes a few thousand nodes per
proof, far off the hot path (the bulk phases stay on GL / device).
"""

from __future__ import annotations

import hashlib
import json
import os

from .bn254 import R

T = 17          # state width (16 rate + 1 capacity)
ROUNDS_F = 8
ROUNDS_P = 68
N_ROUNDS = ROUNDS_F + ROUNDS_P


def _shake_fr(domain: bytes, n: int) -> list[int]:
    out: list[int] = []
    counter = 0
    while len(out) < n:
        h = hashlib.shake_256(domain + counter.to_bytes(8, "little")).digest(40)
        counter += 1
        v = int.from_bytes(h, "little")
        if v < (R << 64):  # negligible bias after mod
            out.append(v % R)
    return out


def _generate():
    C = _shake_fr(b"zkevm_prover_tpu/poseidon-bn128/rc/v1", N_ROUNDS * T)
    # Cauchy MDS over Fr: m[i][j] = 1/(x_i + y_j), x_i = i, y_j = T + j
    M = [[pow(i + T + j, R - 2, R) for j in range(T)] for i in range(T)]
    return C, M


_C, _M = _generate()
_source = "generated:v1"


def load_constants(path: str | None = None) -> None:
    global _C, _M, _source
    if path is None:
        _C, _M = _generate()
        _source = "generated:v1"
        return
    with open(path) as f:
        data = json.load(f)
    C = [int(v) % R for v in data["C"]]
    M = [[int(v) % R for v in row] for row in data["M"]]
    assert len(C) == N_ROUNDS * T and len(M) == T
    _C, _M = C, M
    _source = os.path.abspath(path)


def permute(state: list[int]) -> list[int]:
    assert len(state) == T
    s = [v % R for v in state]
    half = ROUNDS_F // 2
    for r in range(N_ROUNDS):
        s = [(s[i] + _C[r * T + i]) % R for i in range(T)]
        if half <= r < half + ROUNDS_P:
            s[0] = _sbox(s[0])
        else:
            s = [_sbox(v) for v in s]
        s = [sum(_M[i][j] * s[j] for j in range(T)) % R for i in range(T)]
    return s


def _sbox(x: int) -> int:
    x2 = x * x % R
    return x2 * x2 % R * x % R


def hash16(inputs: list[int], capacity: int = 0) -> int:
    """Arity-16 compression: 16 Fr inputs + capacity -> 1 Fr."""
    assert len(inputs) == 16
    return permute(list(inputs) + [capacity])[0]


def linear_hash_fr(values: list[int]) -> int:
    """Sponge over chunks of 16 Fr with the digest carried in the capacity
    (the reference's MerkleTreeBN128 leaf hashing shape)."""
    if not values:
        return 0
    digest = 0
    for off in range(0, len(values), 16):
        chunk = list(values[off : off + 16])
        chunk += [0] * (16 - len(chunk))
        digest = hash16(chunk, digest)
    return digest


GL_P = 0xFFFFFFFF_00000001


def pack_gl(values) -> list[int]:
    """Pack GL elements 3-per-Fr (3·64 = 192 < 253 bits) — the reference's
    element conversion for BN128 trees (merkleTreeBN128.cpp)."""
    out = []
    for off in range(0, len(values), 3):
        chunk = values[off : off + 3]
        acc = 0
        for i, v in enumerate(chunk):
            acc |= int(v) << (64 * i)
        out.append(acc % R)
    return out
