"""Fiat-Shamir transcript: Poseidon sponge, rate 8 / state 4 / out 12.

Host-side exact implementation of the reference's `Transcript`
(src/starkpil/transcript/transcript.cpp): absorb into an 8-slot pending
buffer, permute [pending(8) ‖ state(4)] when full, squeeze field elements
from the 12-wide output front-to-back; query indices come from bit-slicing
squeezed elements 63 bits at a time (getPermutations, transcript.cpp:57-88).

The transcript performs a handful of permutations per proof, so it runs on
the host with exact big-int arithmetic (the device is for the bulk phases).
"""

from __future__ import annotations

from . import poseidon_constants as pc
from . import refmodel as rm

PENDING_SIZE = 8
STATE_SIZE = 4
OUT_SIZE = 12
P = rm.P


class Transcript:
    def __init__(self):
        self._poseidon = rm.Poseidon(pc.round_constants(), pc.mds_matrix())
        self.state = [0] * STATE_SIZE
        self.pending: list[int] = []
        self.out: list[int] = []
        self.out_cursor = 0

    def put(self, values) -> None:
        for v in values:
            self._add1(int(v) % P)

    def _permute_pending(self) -> None:
        inputs = self.pending + [0] * (PENDING_SIZE - len(self.pending)) + self.state
        self.out = self._poseidon.hash_full(inputs)
        self.out_cursor = OUT_SIZE
        self.pending = []
        self.state = self.out[:STATE_SIZE]

    def _add1(self, v: int) -> None:
        self.pending.append(v)
        self.out_cursor = 0
        if len(self.pending) == PENDING_SIZE:
            self._permute_pending()

    def get_field1(self) -> int:
        if self.out_cursor == 0:
            self._permute_pending()
        v = self.out[(OUT_SIZE - self.out_cursor) % OUT_SIZE]
        self.out_cursor -= 1
        return v

    def get_field3(self) -> tuple[int, int, int]:
        return (self.get_field1(), self.get_field1(), self.get_field1())

    def get_permutations(self, n: int, n_bits: int) -> list[int]:
        total_bits = n * n_bits
        n_fields = (total_bits - 1) // 63 + 1
        fields = [self.get_field1() for _ in range(n_fields)]
        res = []
        cur_field = 0
        cur_bit = 0
        for _ in range(n):
            a = 0
            for j in range(n_bits):
                if (fields[cur_field] >> cur_bit) & 1:
                    a |= 1 << j
                cur_bit += 1
                if cur_bit == 63:
                    cur_bit = 0
                    cur_field += 1
            res.append(a)
        return res
