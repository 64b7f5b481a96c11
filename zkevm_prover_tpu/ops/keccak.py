"""Keccak-256 — batched keccak-f[1600] on device + host sponge.

TPU-native replacement for the reference's XKCP compact Keccak
(src/XKCP/Keccak-more-compact.cpp, used for tx hashing, witness parsing and
the fflonk transcript) and the hot path of the Keccak SM pipeline
(src/sm/keccak_f/ evaluates 44 bit-sliced keccak-f instances per 155,286-row
slot; here a single device call permutes an arbitrary BATCH of states —
the TPU analogue of that bit-slicing is the leading batch axis on the VPU).

State layout: (..., 25) uint64 lanes, lane index = x + 5*y (FIPS-202 order).
The 24 rounds are unrolled at trace time; XLA fuses the whole permutation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# FIPS-202 round constants
_RC = np.array(
    [
        0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
        0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
        0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
        0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
        0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
        0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
        0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
        0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
    ],
    dtype=np.uint64,
)

# rotation offsets r[x + 5y]
_ROT = np.array(
    [
        0, 1, 62, 28, 27,
        36, 44, 6, 55, 20,
        3, 10, 43, 25, 39,
        41, 45, 15, 21, 8,
        18, 2, 61, 56, 14,
    ],
    dtype=np.uint64,
)

RATE_BYTES = 136  # keccak-256 rate (1088 bits)


def _rotl(v, r: int):
    r = int(r) % 64
    if r == 0:
        return v
    return (v << np.uint64(r)) | (v >> np.uint64(64 - r))


def keccak_f(state):
    """keccak-f[1600] over (..., 25) uint64 lane arrays (batched).

    One round is traced once and driven by lax.fori_loop — a fully unrolled
    24-round graph makes XLA's CPU backend pathologically slow to compile,
    and the loop costs nothing on TPU (the body is a single fused kernel).
    """
    import jax

    rc = jnp.asarray(_RC)

    def round_fn(rnd, st):
        s = [st[..., i] for i in range(25)]
        # theta
        c = [s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20] for x in range(5)]
        d = [c[(x + 4) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        s = [s[i] ^ d[i % 5] for i in range(25)]
        # rho + pi
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl(
                    s[x + 5 * y], int(_ROT[x + 5 * y])
                )
        # chi
        s = [
            b[i] ^ ((~b[(i + 1) % 5 + 5 * (i // 5)]) & b[(i + 2) % 5 + 5 * (i // 5)])
            for i in range(25)
        ]
        # iota
        s[0] = s[0] ^ rc[rnd]
        return jnp.stack(s, axis=-1)

    return jax.lax.fori_loop(0, 24, round_fn, state)


def keccak256_blocks(blocks):
    """Digest a batch of pre-padded single-block messages on device.

    blocks: (B, RATE_BYTES) uint8, already keccak-padded (0x01 … 0x80).
    Returns (B, 32) uint8 digests. For longer messages use `keccak256`.
    """
    b = blocks.shape[0]
    lanes = jnp.asarray(blocks).reshape(b, RATE_BYTES // 8, 8)
    lanes = _bytes_to_lanes(lanes)
    state = jnp.zeros((b, 25), dtype=jnp.uint64)
    state = state.at[:, : RATE_BYTES // 8].set(lanes)
    out = keccak_f(state)
    return _lanes_to_bytes(out[:, :4])


def _bytes_to_lanes(by):
    """(..., L, 8) uint8 -> (..., L) uint64 little-endian lanes."""
    sh = np.uint64
    acc = by[..., 0].astype(jnp.uint64)
    for i in range(1, 8):
        acc = acc | (by[..., i].astype(jnp.uint64) << sh(8 * i))
    return acc


def _lanes_to_bytes(lanes):
    """(..., L) uint64 -> (..., L*8) uint8 little-endian."""
    parts = [
        ((lanes >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(jnp.uint8)
        for i in range(8)
    ]
    return jnp.stack(parts, axis=-1).reshape(*lanes.shape[:-1], lanes.shape[-1] * 8)


# ---------------------------------------------------------------------------
# host sponge (arbitrary-length messages; exact python ints)
# ---------------------------------------------------------------------------


def _keccak_f_host(lanes: list[int]) -> list[int]:
    M = (1 << 64) - 1
    rotl = lambda v, r: ((v << r) | (v >> (64 - r))) & M
    s = list(lanes)
    for rnd in range(24):
        c = [s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20] for x in range(5)]
        d = [c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1) for x in range(5)]
        s = [s[i] ^ d[i % 5] for i in range(25)]
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(s[x + 5 * y], int(_ROT[x + 5 * y]))
        s = [
            b[i] ^ ((~b[(i + 1) % 5 + 5 * (i // 5)] & M) & b[(i + 2) % 5 + 5 * (i // 5)])
            for i in range(25)
        ]
        s[0] ^= int(_RC[rnd])
    return s


def keccak256(data: bytes) -> bytes:
    """Ethereum Keccak-256 of an arbitrary byte string (host, exact).

    Mirrors the reference's `Keccak()` entry (src/XKCP, pad 0x01/0x80).
    """
    state = [0] * 25
    msg = bytearray(data)
    msg.append(0x01)
    while len(msg) % RATE_BYTES:
        msg.append(0x00)
    msg[-1] |= 0x80
    for off in range(0, len(msg), RATE_BYTES):
        block = msg[off : off + RATE_BYTES]
        for i in range(RATE_BYTES // 8):
            state[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        state = _keccak_f_host(state)
    out = b"".join(int(state[i]).to_bytes(8, "little") for i in range(4))
    return out
