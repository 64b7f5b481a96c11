"""Keccak-f[1600] gate circuit builder — XOR/ANDP wire graph.

Reference: tools/sm/keccak_f/keccak.cpp + keccak_gen.cpp generate a JSON
"script" of XOR and ANDP gates (keccak-f as a 2-op circuit, ~155k gates,
slotSize 155,286 — keccak_f_executor.hpp:47-48) that the KeccakF SM
replays bit-sliced over 44 packed instances. Here the circuit is built
directly in Python (no offline JSON artifact): one wire per state bit,
gates emitted in topological row order, the rho/pi rotations free as wire
re-indexing.

Row layout of one slot (the KeccakF SM's unit):
  row 0              the ONE row: its a-position is the all-ones packed
                     constant (pinned by the SM), c = a XOR a = ZERO
  rows 1..1600       input rows: a carries state bit (x,y,z) of the packed
                     instances, b wired to ZERO, c = a (the bit's wire)
  rows 1601..        the 24-round gate sequence; the final state's 1600
                     output wires are recorded in `outputs`

`rounds` is parameterizable so tests can prove a reduced-round circuit on
a small domain (the gate count ~6.4k/round is fixed by keccak-f itself).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...ops.keccak import _RC, _ROT

XOR = 0
ANDP = 1
AND = 2   # used by the SHA-256 circuit (keccak needs only XOR/ANDP)

# wire reference: (column, row) with columns 0=a, 1=b, 2=c
A, B, C = 0, 1, 2


def gate_eval(op: int, a: int, b: int, mask: int) -> int:
    if op == XOR:
        return a ^ b
    if op == ANDP:
        return (a ^ mask) & b
    if op == AND:
        return a & b
    raise ValueError(op)


@dataclasses.dataclass
class Circuit:
    ops: np.ndarray          # (n_rows,) gate op per row
    a_src: list              # (col, row) source wire of each row's a
    b_src: list              # source wire of each row's b
    inputs: list             # rows whose a-position takes input bits
    outputs: list            # (col, row) wires of the final state
    one: tuple               # the all-ones wire position
    zero: tuple              # the all-zeros wire position
    rounds: int
    in_words: int = 25       # input layout: words × word_bits bits
    word_bits: int = 64
    out_words: int = 25

    @property
    def n_rows(self) -> int:
        return len(self.ops)


def build(rounds: int = 24) -> Circuit:
    ops: list[int] = []
    a_src: list[tuple] = []
    b_src: list[tuple] = []

    def gate(op, a, b) -> tuple:
        ops.append(op)
        a_src.append(a)
        b_src.append(b)
        return (C, len(ops) - 1)

    # row 0: a pinned to all-ones by the SM; c = a XOR a = 0
    one = (A, 0)
    zero = gate(XOR, one, one)

    # input rows: c = bit XOR 0 = bit
    inputs = []
    wires = [[None] * 64 for _ in range(25)]  # wires[x+5y][z]
    for i in range(25):
        for z in range(64):
            w = gate(XOR, (A, len(ops)), zero)  # a self-reference: input slot
            inputs.append(w[1])
            wires[i][z] = w

    def xor(a, b):
        return gate(XOR, a, b)

    def andp(a, b):
        return gate(ANDP, a, b)

    for rnd in range(rounds):
        # theta
        c = [[None] * 64 for _ in range(5)]
        for x in range(5):
            for z in range(64):
                t = xor(wires[x][z], wires[x + 5][z])
                t = xor(t, wires[x + 10][z])
                t = xor(t, wires[x + 15][z])
                c[x][z] = xor(t, wires[x + 20][z])
        d = [[None] * 64 for _ in range(5)]
        for x in range(5):
            for z in range(64):
                # D[x] = C[x-1] ^ rotl(C[x+1], 1): bit z of rotl1 = C[x+1][z-1]
                d[x][z] = xor(c[(x + 4) % 5][z], c[(x + 1) % 5][(z - 1) % 64])
        aw = [[None] * 64 for _ in range(25)]
        for x in range(5):
            for y in range(5):
                for z in range(64):
                    aw[x + 5 * y][z] = xor(wires[x + 5 * y][z], d[x][z])

        # rho + pi: pure re-wiring — bit z of B[y][2x+3y] = A[x][y] rot r
        bw = [[None] * 64 for _ in range(25)]
        for x in range(5):
            for y in range(5):
                r = int(_ROT[x + 5 * y])
                for z in range(64):
                    # rotl by r: output bit z = input bit (z - r) mod 64
                    bw[y + 5 * ((2 * x + 3 * y) % 5)][z] = \
                        aw[x + 5 * y][(z - r) % 64]

        # chi: A[x,y] = B[x,y] ^ (~B[x+1,y] & B[x+2,y])
        nw = [[None] * 64 for _ in range(25)]
        for x in range(5):
            for y in range(5):
                for z in range(64):
                    t = andp(bw[(x + 1) % 5 + 5 * y][z],
                             bw[(x + 2) % 5 + 5 * y][z])
                    nw[x + 5 * y][z] = xor(bw[x + 5 * y][z], t)
        wires = nw

        # iota: lane (0,0) ^= RC[rnd] (only the set bits cost a gate)
        rc = int(_RC[rnd])
        for z in range(64):
            if (rc >> z) & 1:
                wires[0][z] = xor(wires[0][z], one)

    outputs = [wires[i][z] for i in range(25) for z in range(64)]
    return Circuit(ops=np.array(ops, dtype=np.uint64), a_src=a_src,
                   b_src=b_src, inputs=inputs, outputs=outputs,
                   one=one, zero=zero, rounds=rounds)


def _pack_inputs(circ: Circuit, states: np.ndarray, pack: int) -> dict:
    """Bit-slice k instances: element for input bit (word i, bit z) packs
    that bit of every instance into lanes 0..k-1."""
    k = states.shape[0]
    assert k <= pack
    packed_in = {}
    bit_idx = 0
    for i in range(circ.in_words):
        for z in range(circ.word_bits):
            v = 0
            for j in range(k):
                v |= ((int(states[j, i]) >> z) & 1) << j
            packed_in[circ.inputs[bit_idx]] = v
            bit_idx += 1
    return packed_in


def wire_values(circ: Circuit, states: np.ndarray, pack: int) -> np.ndarray:
    """Full (n_rows, 3) packed wire assignment — the SM trace payload.

    states: (k, in_words) word arrays, k <= pack.
    """
    mask = (1 << pack) - 1
    vals = np.zeros((circ.n_rows, 3), dtype=object)
    vals[0][A] = mask
    packed_in = _pack_inputs(circ, states, pack)
    for row in range(circ.n_rows):
        if row in packed_in:
            vals[row][A] = packed_in[row]
        elif not (circ.a_src[row][0] == A and circ.a_src[row][1] == row):
            vals[row][A] = vals[circ.a_src[row][1]][circ.a_src[row][0]]
        sb = circ.b_src[row]
        vals[row][B] = vals[sb[1]][sb[0]]
        a, b = vals[row][A], vals[row][B]
        vals[row][C] = gate_eval(int(circ.ops[row]), a, b, mask)
    return vals


def evaluate(circ: Circuit, states: np.ndarray, pack: int) -> np.ndarray:
    """Run the circuit on up to `pack` bit-sliced instances.

    states: (k, in_words) word arrays. Returns (k, out_words) outputs.
    Used by the SM's execute() and as the oracle for tests.
    """
    k = states.shape[0]
    vals = wire_values(circ, states, pack)
    out = np.zeros((k, circ.out_words), dtype=np.uint64)
    for i in range(circ.out_words):
        for z in range(circ.word_bits):
            col, r = circ.outputs[i * circ.word_bits + z]
            v = int(vals[r][col])
            for j in range(k):
                out[j, i] |= np.uint64(((v >> j) & 1) << z)
    return out
