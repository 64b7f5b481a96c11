"""PaddingSha256 SM — SHA-256 byte-stream padding over 64-byte blocks.

Reference: src/sm/padding_sha256/ (+ padding_sha256bit): one row per
padded byte; the pad is 0x80, zero filler, and an 8-byte big-endian BIT
length suffix. The suffix is bound to the message's actual length with a
held ILEN column (set at message start from the initial REM) and a LENACC
accumulator over the suffix region, so a prover cannot claim a different
length than the byte count the REM countdown proves.

Each block emits one Sha256F compression action {state, block}; the
compression chain (state' = compress(state, block)) is host-bound pending
the hash-side cross-SM binding, like PaddingKK.
"""

from __future__ import annotations

import numpy as np

from ...ops import goldilocks as gl
from ...ops import sha256 as sha_mod
from ...stark import expr as ex
from ...stark.air import AIR
from . import sha256_circuit

P = gl.P
BLOCK = 64
SUFFIX = 8  # length-suffix bytes

COLS = ["BYTE", "REM", "PAD", "PADFIRST", "LASTH", "ILEN", "LENACC"]


def build_air(n_bits: int) -> AIR:
    n = 1 << n_bits
    n_blocks = n // BLOCK
    air = AIR("padding_sha256", n_bits)
    byte, rem, pad, padfirst, lasth, ilen, lenacc = air.committed(*COLS)

    poslast = np.zeros(n, dtype=np.uint64)
    inblock = np.zeros(n, dtype=np.uint64)
    insuffix = np.zeros(n, dtype=np.uint64)
    for b in range(n_blocks):
        poslast[b * BLOCK + BLOCK - 1] = 1
        inblock[b * BLOCK:(b + 1) * BLOCK] = 1
        insuffix[b * BLOCK + BLOCK - SUFFIX:(b + 1) * BLOCK] = 1
    PL = air.constant("POSLAST", poslast)
    IB = air.constant("INBLOCK", inblock)
    SUF = air.constant("INSUFFIX", insuffix)

    for f in (pad, padfirst, lasth):
        air.require_zero(IB * f * (1 - f))
    air.require_zero(padfirst * (1 - pad))

    mend = PL * lasth
    nIB = ex.Const(IB.id, True)
    G = IB * nIB * (1 - mend)
    pad_p = ex.Cm(pad.id, True)
    padfirst_p = ex.Cm(padfirst.id, True)
    rem_p = ex.Cm(rem.id, True)
    lasth_p = ex.Cm(lasth.id, True)
    ilen_p = ex.Cm(ilen.id, True)
    lenacc_p = ex.Cm(lenacc.id, True)

    air.require_zero(G * (pad_p - pad - padfirst_p))
    air.require_zero(IB * nIB * mend * (pad_p - padfirst_p))
    air.require_zero(IB * nIB * (1 - PL) * (lasth_p - lasth))

    # pad shape: 0x80 at the rise, zero filler through the non-suffix pad
    air.require_zero(padfirst * (byte - 0x80))
    air.require_zero(IB * pad * (1 - padfirst) * (1 - SUF * lasth) * byte)

    # REM countdown (same scheme as PaddingKK)
    air.require_zero(G * (1 - pad_p) * (rem_p - rem + 1))
    air.require_zero(IB * pad * rem)
    air.require_zero(G * padfirst_p * (rem - 1) * (1 - pad))

    # ILEN: held through the message, equal to REM at the message start
    air.require_zero(G * (ilen_p - ilen))
    air.require_zero(IB * nIB * mend * (ilen_p - rem_p))
    l1 = air.lagrange_first()
    air.require_zero(l1 * (ilen - rem))

    # BYTE is a byte (the suffix accumulator's injectivity needs it)
    air.lookup([byte], [air.constant(
        "BYTETAB", np.arange(n, dtype=np.uint64) % 256)], sel_f=IB)

    # LENACC: big-endian byte accumulator over the last block's suffix;
    # at the message end it must equal the bit length 8·ILEN
    air.require_zero((1 - SUF) * lenacc)
    suf_first = np.zeros(n, dtype=np.uint64)
    for b in range(n_blocks):
        suf_first[b * BLOCK + BLOCK - SUFFIX] = 1
    SUFF = air.constant("SUFFIRST", suf_first)
    # within the suffix: LENACC' = 256·LENACC + BYTE'  (first row seeds)
    nSUF = ex.Const(SUF.id, True)
    nSUFF = ex.Const(SUFF.id, True)
    byte_p = ex.Cm(byte.id, True)
    air.require_zero(
        lasth_p * nSUF * (1 - nSUFF) * (lenacc_p - lenacc * 256 - byte_p))
    air.require_zero(lasth * SUFF * (lenacc - byte))
    air.require_zero(IB * mend * (lenacc - ilen * 8))
    # non-final blocks carry data in the suffix region: no LENACC meaning
    air.require_zero(SUF * (1 - lasth) * lenacc)
    return air


def execute(actions: list[dict],
            n_bits: int) -> tuple[np.ndarray, list, list]:
    """actions: [{data: bytes}] (Main's actions.sha256). Returns the trace,
    the emitted Sha256F actions ({state, block} word pairs), and the
    per-message digests."""
    n = 1 << n_bits
    n_blocks = n // BLOCK
    ci = {nm: i for i, nm in enumerate(COLS)}
    tr = np.zeros((n, len(COLS)), dtype=np.uint64)
    sha_actions = []
    digests = []

    msgs = [bytes(a["data"]) for a in actions]
    blocks_needed = sum((len(m) + SUFFIX) // BLOCK + 1 for m in msgs)
    assert blocks_needed <= n_blocks, "padding_sha256 domain overflow"
    while blocks_needed < n_blocks:
        msgs.append(b"")
        blocks_needed += 1

    row = 0
    for msg in msgs:
        nb = (len(msg) + SUFFIX) // BLOCK + 1
        padded = bytearray(msg) + bytearray(nb * BLOCK - len(msg))
        padded[len(msg)] = 0x80
        padded[-SUFFIX:] = (8 * len(msg)).to_bytes(SUFFIX, "big")
        state = [int(v) for v in sha256_circuit.initial_state()]
        lenacc = 0
        for b in range(nb):
            last = b == nb - 1
            block_words = []
            for wi in range(16):
                word = int.from_bytes(
                    padded[b * BLOCK + 4 * wi:b * BLOCK + 4 * wi + 4],
                    "big")
                block_words.append(word)
            for i in range(BLOCK):
                g = b * BLOCK + i
                t = tr[row]
                t[ci["BYTE"]] = padded[g]
                t[ci["REM"]] = max(len(msg) - g, 0)
                t[ci["PAD"]] = 1 if g >= len(msg) else 0
                t[ci["PADFIRST"]] = 1 if g == len(msg) else 0
                t[ci["LASTH"]] = 1 if last else 0
                t[ci["ILEN"]] = len(msg)
                if last and i >= BLOCK - SUFFIX:
                    lenacc = lenacc * 256 + padded[g]
                    t[ci["LENACC"]] = lenacc
                row += 1
            sha_actions.append({"state": list(state),
                                "block": block_words})
            state = _compress_host(state, block_words)
        digests.append(sum(int(state[i]) << (32 * (7 - i))
                           for i in range(8)))
    return tr, sha_actions, digests


def _compress_host(state, block_words):
    import numpy as _np

    out = sha_mod.sha256_compress(
        _np.array([state], dtype=_np.uint32),
        _np.array([block_words], dtype=_np.uint32))
    import jax

    return [int(v) for v in jax.device_get(out)[0]]


def digest_of(data: bytes) -> int:
    return int.from_bytes(sha_mod.sha256(bytes(data)), "big")
