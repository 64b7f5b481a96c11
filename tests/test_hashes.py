"""Keccak-256 and SHA-256 device kernels vs known vectors / hashlib.

Mirrors the reference's hash test configs (testvectors/hashFunctions/
config_keccak_test.json, config_sha256_test.json; SURVEY.md §4.1)."""

import hashlib

import jax
import numpy as np

from zkevm_prover_tpu.ops import keccak, sha256


def test_keccak256_known_vectors():
    # reference vectors (Ethereum Keccak-256)
    assert keccak.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block message (> 136 bytes)
    long = bytes(range(256))
    one = keccak.keccak256(long)
    assert len(one) == 32


def test_keccak_f_device_vs_host():
    rng = np.random.default_rng(1)
    states = rng.integers(0, 1 << 64, size=(5, 25), dtype=np.uint64)
    got = np.asarray(jax.jit(keccak.keccak_f)(states))
    for b in range(5):
        want = keccak._keccak_f_host([int(v) for v in states[b]])
        assert [int(v) for v in got[b]] == want


def test_keccak256_blocks_device():
    msgs = [b"abc", b"", b"hello world"]
    blocks = np.zeros((len(msgs), keccak.RATE_BYTES), dtype=np.uint8)
    for i, m in enumerate(msgs):
        blocks[i, : len(m)] = bytearray(m)
        blocks[i, len(m)] ^= 0x01
        blocks[i, -1] ^= 0x80
    got = np.asarray(jax.jit(keccak.keccak256_blocks)(blocks))
    for i, m in enumerate(msgs):
        assert bytes(got[i]) == keccak.keccak256(m)


def test_sha256_blocks_device_vs_hashlib():
    msgs = [b"abc", b"", b"The quick brown fox jumps over the lazy dog"]
    blocks = np.zeros((len(msgs), 64), dtype=np.uint8)
    for i, m in enumerate(msgs):
        assert len(m) < 56
        blocks[i, : len(m)] = bytearray(m)
        blocks[i, len(m)] = 0x80
        blocks[i, 56:64] = np.frombuffer(
            (8 * len(m)).to_bytes(8, "big"), dtype=np.uint8
        )
    got = np.asarray(jax.jit(sha256.sha256_blocks)(blocks))
    for i, m in enumerate(msgs):
        assert bytes(got[i]) == hashlib.sha256(m).digest()
