"""Fiat-Shamir transcript over BN254 Fr (the recursiveF stage transcript).

Reference: src/starkpil/transcript/transcriptBN128.cpp — the same sponge
pattern as the GL transcript but 16-wide over Fr with Poseidon_opt. GL
challenge triples are carved out of each squeezed Fr element as three
63-bit chunks (the element has 253 usable bits); query indices bit-slice
squeezed elements exactly like the GL getPermutations.
"""

from __future__ import annotations

from . import poseidon_bn128 as pbn

P_GL = 0xFFFFFFFF_00000001
PENDING = 16


class TranscriptBN128:
    def __init__(self):
        self.state = 0
        self.pending: list[int] = []
        self.out: list[int] = []

    def put(self, values) -> None:
        for v in values:
            self._add1(int(v) % pbn.R)

    def _permute_pending(self) -> None:
        inputs = self.pending + [0] * (PENDING - len(self.pending))
        self.out = pbn.permute(inputs + [self.state])
        self.pending = []
        self.state = self.out[0]

    def _add1(self, v: int) -> None:
        self.pending.append(v)
        self.out = []
        if len(self.pending) == PENDING:
            self._permute_pending()

    def get_fr(self) -> int:
        if not self.out:
            self._permute_pending()
        v = self.out.pop(0)
        return v

    def get_field3(self) -> tuple[int, int, int]:
        """One GL cubic-extension challenge from one squeezed Fr element."""
        v = self.get_fr()
        return (
            (v & ((1 << 63) - 1)) % P_GL,
            ((v >> 63) & ((1 << 63) - 1)) % P_GL,
            ((v >> 126) & ((1 << 63) - 1)) % P_GL,
        )

    def get_permutations(self, n: int, n_bits: int) -> list[int]:
        total_bits = n * n_bits
        n_fields = (total_bits - 1) // 252 + 1
        fields = [self.get_fr() for _ in range(n_fields)]
        res = []
        cur_field = 0
        cur_bit = 0
        for _ in range(n):
            a = 0
            for j in range(n_bits):
                if (fields[cur_field] >> cur_bit) & 1:
                    a |= 1 << j
                cur_bit += 1
                if cur_bit == 252:
                    cur_bit = 0
                    cur_field += 1
            res.append(a)
        return res
