"""R1CS gadgets for the recursive STARK-verifier circuit.

Reference: the recursive circom circuits (stark_verifier.circom templates
compiled into src/starkpil/starkRecursive*/ witness calculators). These
gadgets are their building blocks re-implemented over our R1CS builder:

  * Poseidon-BN128 permutation (native Fr arithmetic — the reason the
    recursiveF stage re-proves with the BN128 commitment scheme),
  * arity-16 Merkle path verification,
  * Goldilocks arithmetic embedded in Fr (mul with quotient/remainder
    decomposition and 64-bit range bits) for the FRI/eval algebra.

`Synthesizer` pairs the constraint builder with a witness vector so each
gadget both constrains and computes; circuits stay provable with
snark.groth16 / snark.plonk. Full verifier assembly (transcript replay,
query folding, composition check) is the recursion milestone tracked in
docs/RECURSION.md — these gadgets are its tested foundation.
"""

from __future__ import annotations

from ..ops import bn254, poseidon_bn128 as pbn
from .r1cs import R1CS

R = bn254.R
GL_P = 0xFFFFFFFF_00000001


class Synthesizer:
    """R1CS builder + witness values, kept in lockstep."""

    def __init__(self, n_public: int):
        self.b = R1CS.builder(n_public)
        self.w: list[int] = [1] + [0] * n_public

    def set_public(self, i: int, value: int) -> None:
        self.w[1 + i] = value % R

    def alloc(self, value: int) -> int:
        idx = self.b.alloc()
        assert idx == len(self.w)
        self.w.append(value % R)
        return idx

    def _lc_val(self, lc: dict) -> int:
        return sum(c * self.w[i] for i, c in lc.items()) % R

    def mul_lc(self, a: dict, b: dict) -> int:
        """z = (Σa)(Σb) — linear combinations are free in R1CS."""
        z = self.alloc(self._lc_val(a) * self._lc_val(b) % R)
        self.b.constrain(a, b, {z: 1})
        return z

    def lin(self, lc: dict) -> int:
        """Materialize a linear combination as a signal (1 constraint)."""
        z = self.alloc(self._lc_val(lc))
        self.b.constrain(lc, {0: 1}, {z: 1})
        return z

    def assert_eq(self, x: int, y: int) -> None:
        self.b.constrain({x: 1, y: R - 1}, {0: 1}, {0: 0})

    def assert_bool(self, x: int) -> None:
        self.b.constrain({x: 1}, {x: 1, 0: R - 1}, {0: 0})

    def bits(self, x: int, n: int) -> list[int]:
        """Decompose x into n bits (n+1 constraints); x must fit."""
        v = self.w[x]
        bs = []
        lc = {}
        for i in range(n):
            bi = self.alloc((v >> i) & 1)
            self.assert_bool(bi)
            bs.append(bi)
            lc[bi] = 1 << i
        lc[x] = R - 1
        self.b.constrain(lc, {0: 1}, {0: 0})
        return bs

    def finish(self):
        return self.b.build(), list(self.w)


# ---------------------------------------------------------------------------
# Poseidon-BN128 permutation gadget
# ---------------------------------------------------------------------------


def poseidon_bn128_permute(s: Synthesizer, state: list[int]) -> list[int]:
    """Constrain one width-17 Poseidon permutation; state = signal ids.
    ~1.9k constraints (8 full + 68 partial rounds, x^5 S-box)."""
    T = pbn.T
    half = pbn.ROUNDS_F // 2
    cur = list(state)

    def sbox_lc(lc: dict) -> int:
        x2 = s.mul_lc(lc, lc)
        x4 = s.mul_lc({x2: 1}, {x2: 1})
        return s.mul_lc({x4: 1}, lc)

    for r in range(pbn.N_ROUNDS):
        with_c = [{cur[i]: 1, 0: pbn._C[r * T + i]} for i in range(T)]
        if half <= r < half + pbn.ROUNDS_P:
            out0 = sbox_lc(with_c[0])
            sboxed = [{out0: 1}] + with_c[1:]
        else:
            sboxed = [{sbox_lc(lc): 1} for lc in with_c]
        nxt = []
        for i in range(T):
            lc: dict = {}
            for j in range(T):
                m = pbn._M[i][j]
                for sig, coef in sboxed[j].items():
                    lc[sig] = (lc.get(sig, 0) + m * coef) % R
            nxt.append(s.lin(lc))
        cur = nxt
    return cur


def poseidon_hash16(s: Synthesizer, inputs: list[int],
                    capacity: int | None = None) -> int:
    """Arity-16 compression gadget: 16 signals (+ capacity signal) -> 1."""
    cap = capacity if capacity is not None else s.alloc(0)
    if capacity is None:
        s.b.constrain({cap: 1}, {0: 1}, {0: 0})  # capacity pinned to 0
    return poseidon_bn128_permute(s, list(inputs) + [cap])[0]


def merkle_path_arity16(s: Synthesizer, leaf: int, siblings: list[list[int]],
                        positions: list[int], root: int) -> None:
    """Verify an arity-16 Merkle path (the BN128 tree of ops/merkle_bn128).

    siblings[l] = 15 sibling signals at level l; positions[l] = the static
    child slot of the running hash (query indices are public in the STARK
    verifier, so the slots specialize the circuit instance).
    """
    cur = leaf
    for sibs, pos in zip(siblings, positions):
        children = list(sibs)
        children.insert(pos, cur)
        cur = poseidon_hash16(s, children)
    s.assert_eq(cur, root)


# ---------------------------------------------------------------------------
# Goldilocks arithmetic embedded in Fr
# ---------------------------------------------------------------------------


def gl_mul(s: Synthesizer, a: int, b: int) -> int:
    """r = a·b mod p_GL with committed quotient: a·b = q·p + r,
    q and r range-checked to 64 bits (~132 constraints).

    Note: r < 2^64 (not the canonical r < p) — canonicalize at circuit
    boundaries the way the reference's circom GL templates do.
    """
    t = s.w[a] * s.w[b] % R
    q_v, r_v = divmod(t, GL_P)
    q = s.alloc(q_v)
    r = s.alloc(r_v)
    # a·b - q·p - r = 0
    s.b.constrain({a: 1}, {b: 1}, {q: GL_P, r: 1})
    s.bits(q, 64)
    s.bits(r, 64)
    return r


def gl_add(s: Synthesizer, a: int, b: int) -> int:
    """r = a+b mod p_GL (one conditional subtraction via a carry bit)."""
    t = s.w[a] + s.w[b]
    carry_v, r_v = divmod(t, GL_P)
    carry = s.alloc(carry_v)
    r = s.alloc(r_v)
    s.assert_bool(carry)
    s.b.constrain({a: 1, b: 1, carry: R - GL_P, r: R - 1}, {0: 1}, {0: 0})
    s.bits(r, 64)
    return r


def gl3_mul(s: Synthesizer, a: list[int], b: list[int]) -> list[int]:
    """Cubic-extension mul (x³ = x + 1), nine gl_muls + reduction adds."""
    p = [[gl_mul(s, a[i], b[j]) for j in range(3)] for i in range(3)]
    # (a0+a1x+a2x²)(b0+b1x+b2x²) mod (x³ - x - 1)
    c0 = gl_add(s, p[0][0], gl_add(s, p[1][2], p[2][1]))
    c1 = gl_add(s, gl_add(s, p[0][1], p[1][0]),
                gl_add(s, gl_add(s, p[1][2], p[2][1]), p[2][2]))
    c2 = gl_add(s, gl_add(s, p[0][2], p[1][1]),
                gl_add(s, p[2][0], p[2][2]))
    return [c0, c1, c2]
