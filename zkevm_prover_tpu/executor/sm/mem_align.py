"""MemAlign SM — unaligned 256-bit reads across two 32-byte words.

Reference: src/sm/mem_align/ (unaligned read/write over a W0‖W1 64-byte
window with byte routing via factor/reset tables). TPU-first redesign: one
operation occupies a 128-row group —

  rows 0..63   window rows: B = byte i of W0‖W1 (little-endian),
               accumulated into the W0/W1 limb registers with CONSTANT
               factors (F = 256^(i%4) routed to limb i>>2)
  rows 64..95  value rows: B = output byte k of V, accumulated into the V
               limb registers (factors constant in k)
  rows 96..127 idle

and the offset logic collapses into ONE plookup: every value row's pair
(OFF + k, B) must appear among the window rows' pairs (WPOS, B). Window
positions are unique per group, so each output byte is pinned to exactly
the window byte at its claimed offset — no offset-dependent factor tables.

Committed: B, OFF (group-constant), M0_0..7 / M1_0..7 / V_0..7 running limb
accumulators (finals at the last group row). Lookups: index-byte binding,
B in [0,256), OFF in [0,32].
"""

from __future__ import annotations

import numpy as np

from ...stark import expr as ex
from ...stark.air import AIR

GROUP = 128
WIN = 64     # window rows per group
VAL = 32     # value rows per group
N_LIMB = 8   # 32-bit limbs per 256-bit value


def build_air(n_bits: int) -> AIR:
    n = 1 << n_bits
    assert n % GROUP == 0
    air = AIR("mem_align", n_bits)
    b = air.committed("B")
    off = air.committed("OFF")
    m0 = air.committed(*[f"M0_{j}" for j in range(N_LIMB)])
    m1 = air.committed(*[f"M1_{j}" for j in range(N_LIMB)])
    v = air.committed(*[f"V_{j}" for j in range(N_LIMB)])

    pos = np.arange(n, dtype=np.uint64) % GROUP
    wsel = (pos < WIN).astype(np.uint64)
    vsel = ((pos >= WIN) & (pos < WIN + VAL)).astype(np.uint64)
    clk0 = (pos == 0).astype(np.uint64)
    not_last = (pos != GROUP - 1).astype(np.uint64)

    WSEL = air.constant("WSEL", wsel)
    VSEL = air.constant("VSEL", vsel)
    CLK0 = air.constant("CLK0", clk0)
    NLG = air.constant("NOT_LAST_G", not_last)
    WPOS = air.constant("WPOS", np.where(pos < WIN, pos, 0).astype(np.uint64))
    KPOS = air.constant(
        "KPOS", np.where(vsel == 1, pos - WIN, 0).astype(np.uint64)
    )
    BYTERANGE = air.constant(
        "BYTERANGE", (np.arange(n, dtype=np.uint64) % 256)
    )
    OFFRANGE = air.constant(
        "OFFRANGE", (np.arange(n, dtype=np.uint64) % 33)
    )
    # group id scopes the index-byte binding to its own operation (the
    # lookup is a global multiset argument)
    GID = air.constant("GID", (np.arange(n, dtype=np.uint64) // GROUP))

    # routing factors (constant): window byte i -> W0/W1 limb (i>>2)%8 with
    # multiplier 256^(i%4); value byte k -> V limb k>>2 likewise
    def factor_col(name, active_of):
        cols = []
        for j in range(N_LIMB):
            vals = np.zeros(n, dtype=np.uint64)
            for row in range(n):
                a = active_of(int(pos[row]))
                if a is not None and a[0] == j:
                    vals[row] = a[1]
            cols.append(air.constant(f"{name}{j}", vals))
        return cols

    f0 = factor_col("F0_", lambda p: ((p >> 2), 1 << (8 * (p & 3)))
                    if p < 32 else None)
    f1 = factor_col("F1_", lambda p: (((p - 32) >> 2), 1 << (8 * (p & 3)))
                    if 32 <= p < 64 else None)
    fv = factor_col("FV_", lambda p: (((p - WIN) >> 2), 1 << (8 * ((p - WIN) & 3)))
                    if WIN <= p < WIN + VAL else None)

    # group-start resets and OFF constancy
    for col in (*m0, *m1, *v):
        air.require_zero(CLK0 * col)
    air.require_zero(NLG * (ex.Cm(off.id, True) - off))

    # accumulator transitions: X' = X + B·F (factors are zero off-rows)
    for j in range(N_LIMB):
        air.require_zero(
            NLG * (ex.Cm(m0[j].id, True) - (m0[j] + b * f0[j]))
        )
        air.require_zero(
            NLG * (ex.Cm(m1[j].id, True) - (m1[j] + b * f1[j]))
        )
        air.require_zero(
            NLG * (ex.Cm(v[j].id, True) - (v[j] + b * fv[j]))
        )

    # the offset semantics: value rows' (GID, OFF + k, B) must appear among
    # window rows' (GID, WPOS, B)
    air.lookup([GID, off + KPOS, b], [GID, WPOS, b], sel_f=VSEL, sel_t=WSEL)
    # byte and offset ranges
    air.lookup([b], [BYTERANGE])
    air.lookup([off], [OFFRANGE])
    return air


def execute(actions: list[dict], n_bits: int) -> tuple[np.ndarray, list[int]]:
    """actions: [{w0, w1, offset}] (256-bit ints, 0 <= offset <= 32).

    Returns the trace and the read values V = bytes offset..offset+31 of
    W0‖W1 (big-endian byte order within each word, little-endian here:
    byte i of the window = byte i of the little-endian concatenation).
    """
    n = 1 << n_bits
    n_cols = 2 + 3 * N_LIMB
    tr = np.zeros((n, n_cols), dtype=np.uint64)
    assert len(actions) * GROUP <= n
    results = []
    for a_idx, act in enumerate(actions):
        w0, w1, offset = act["w0"], act["w1"], act["offset"]
        assert 0 <= offset <= 32
        window = (w0 | (w1 << 256))
        vbytes = [(window >> (8 * (offset + k))) & 0xFF for k in range(VAL)]
        value = sum(vb << (8 * k) for k, vb in enumerate(vbytes))
        results.append(value)
        base = a_idx * GROUP
        m0 = [0] * N_LIMB
        m1 = [0] * N_LIMB
        vv = [0] * N_LIMB
        for p in range(GROUP):
            if p < WIN:
                byte = (window >> (8 * p)) & 0xFF
            elif p < WIN + VAL:
                byte = vbytes[p - WIN]
            else:
                byte = 0
            tr[base + p] = [byte, offset] + m0 + m1 + vv
            if p < 32:
                m0[p >> 2] += byte << (8 * (p & 3))
            elif p < 64:
                m1[(p - 32) >> 2] += byte << (8 * (p & 3))
            elif p < WIN + VAL:
                k = p - WIN
                vv[k >> 2] += byte << (8 * (k & 3))
    return tr, results


def result(action: dict) -> int:
    window = action["w0"] | (action["w1"] << 256)
    return (window >> (8 * action["offset"])) & ((1 << 256) - 1)
