"""PaddingKK SM — keccak byte-stream padding (pad10*1 over 136-byte blocks).

Reference: src/sm/padding_kk/padding_kk_executor.cpp — one row per padded
byte; tracks remaining message length, enforces the pad10*1 shape
(0x01 first pad byte, zeros, 0x80 on the block's last byte, 0x81 when they
coincide), and hands each 136-byte block to the bit-decomposition /
packing stages (PaddingKKBit → Bits2Field → KeccakF).

Here the trace is the same byte-per-row layout; the absorb chain
state' = keccak-f(state XOR block) is emitted as KeccakF SM actions (one
packed permutation input per block) with the XOR composition host-bound —
the same pending-cross-SM-lookup status as every co-processor binding.

Committed columns:
  BYTE       padded byte value
  REM        remaining unpadded message bytes (counts down on data rows)
  PAD        1 on padding bytes
  PADFIRST   1 on the first padding byte of a message
  LASTH      1 on every row of a message's last block

Constant columns: POSLAST (1 on byte 135 of each complete block),
INBLOCK (0 on the domain tail where 2^n mod 136 rows cannot hold a block).

Message-length and digest binding to Main's hashK actions is host-side.
"""

from __future__ import annotations

import numpy as np

from ...ops import goldilocks as gl
from ...ops import keccak as keccak_mod
from ...stark import expr as ex
from ...stark.air import AIR

P = gl.P
BLOCK = 136  # keccak-256 rate in bytes

COLS = ["BYTE", "REM", "PAD", "PADFIRST", "LASTH"]


def build_air(n_bits: int) -> AIR:
    n = 1 << n_bits
    n_blocks = n // BLOCK
    air = AIR("padding_kk", n_bits)
    byte, rem, pad, padfirst, lasth = air.committed(*COLS)

    poslast = np.zeros(n, dtype=np.uint64)
    inblock = np.zeros(n, dtype=np.uint64)
    for b in range(n_blocks):
        poslast[b * BLOCK + BLOCK - 1] = 1
        inblock[b * BLOCK:(b + 1) * BLOCK] = 1
    PL = air.constant("POSLAST", poslast)
    IB = air.constant("INBLOCK", inblock)

    for f in (pad, padfirst, lasth):
        air.require_zero(IB * f * (1 - f))
    air.require_zero(padfirst * (1 - pad))

    # message end = last byte of a LASTH block; G gates in-message rows
    mend = PL * lasth
    nIB = ex.Const(IB.id, True)
    G = IB * nIB * (1 - mend)       # transition stays inside one message
    pad_p = ex.Cm(pad.id, True)
    padfirst_p = ex.Cm(padfirst.id, True)
    rem_p = ex.Cm(rem.id, True)
    lasth_p = ex.Cm(lasth.id, True)

    # padding is sticky within a message, and PADFIRST marks exactly the rise
    air.require_zero(G * (pad_p - pad - padfirst_p))
    # at a message boundary the next row starts fresh: a pad there can only
    # be an empty message's first pad byte
    air.require_zero(IB * nIB * mend * (pad_p - padfirst_p))
    # LASTH constant within a block (it flags the whole last block)
    air.require_zero(IB * nIB * (1 - PL) * (lasth_p - lasth))

    # pad byte shapes
    not_end = 1 - mend
    air.require_zero(padfirst * not_end * (byte - 0x01))
    air.require_zero(IB * pad * (1 - padfirst) * not_end * byte)
    air.require_zero(IB * mend * (1 - pad))                  # end is padding
    air.require_zero(mend * (byte - 0x80 - padfirst * 0x01))  # 0x80 / 0x81

    # remaining-length accounting: data rows count down to 1, the pad rise
    # consumes the last unit, pad rows hold zero
    air.require_zero(G * (1 - pad_p) * (rem_p - rem + 1))
    air.require_zero(IB * pad * rem)
    air.require_zero(G * padfirst_p * (rem - 1) * (1 - pad))
    return air


def execute(actions: list[dict],
            n_bits: int) -> tuple[np.ndarray, list, list]:
    """actions: [{data: bytes}] (Main's actions.keccak). Returns the trace,
    the emitted KeccakF absorb-chain actions ({"state"} inputs), and the
    per-message digests (sponge oracle, matches ops.keccak.keccak256).
    Unused complete blocks carry empty messages (a lone pad block)."""
    n = 1 << n_bits
    n_blocks = n // BLOCK
    ci = {nm: i for i, nm in enumerate(COLS)}
    tr = np.zeros((n, len(COLS)), dtype=np.uint64)
    keccak_actions = []
    digests = []

    # lay out messages block by block
    msgs = [bytes(a["data"]) for a in actions]
    blocks_needed = sum(len(m) // BLOCK + 1 for m in msgs)
    assert blocks_needed <= n_blocks, "padding_kk domain overflow"
    while blocks_needed < n_blocks:
        msgs.append(b"")
        blocks_needed += 1

    row = 0
    for msg in msgs:
        nb = len(msg) // BLOCK + 1
        padded = bytearray(msg) + bytearray(nb * BLOCK - len(msg))
        padded[len(msg)] |= 0x01
        padded[-1] |= 0x80
        state = [0] * 25
        for b in range(nb):
            last = b == nb - 1
            for i in range(BLOCK):
                g = b * BLOCK + i
                t = tr[row]
                t[ci["BYTE"]] = padded[g]
                t[ci["REM"]] = max(len(msg) - g, 0)
                t[ci["PAD"]] = 1 if g >= len(msg) else 0
                t[ci["PADFIRST"]] = 1 if g == len(msg) else 0
                t[ci["LASTH"]] = 1 if last else 0
                row += 1
            # absorb: XOR the block into the rate lanes, permute
            for j in range(BLOCK // 8):
                lane = int.from_bytes(padded[b * BLOCK + 8 * j:
                                             b * BLOCK + 8 * j + 8],
                                      "little")
                state[j] ^= lane
            keccak_actions.append(
                {"state": np.array(state, dtype=np.uint64)})
            state = [int(v) for v in keccak_mod._keccak_f_host(state)]
        digests.append(
            int.from_bytes(
                b"".join(int(state[j]).to_bytes(8, "little")
                         for j in range(4)), "big"))
    return tr, keccak_actions, digests


def digest_of(data: bytes) -> int:
    """Oracle: keccak-256 digest as the Main SM's scalar convention."""
    return int.from_bytes(keccak_mod.keccak256(bytes(data)), "big")
