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


def gl_lincomb(s: Synthesizer, terms: list, const: int = 0) -> int:
    """r = (const + Σ c_i·v_i) mod p_GL, one reduction for the whole sum.

    terms: [(coeff_int, signal)]. Total < (1+len)·p² keeps the quotient
    within 64+log2(len)+1 bits.
    """
    t = (const + sum(c * s.w[v] for c, v in terms)) % R
    q_v, r_v = divmod(t, GL_P)
    q = s.alloc(q_v)
    r = s.alloc(r_v)
    lc = {v: c % R for c, v in terms}
    lc[q] = (lc.get(q, 0) + R - GL_P) % R
    lc[r] = (lc.get(r, 0) + R - 1) % R
    lc[0] = (lc.get(0, 0) + const) % R
    s.b.constrain(lc, {0: 1}, {0: 0})
    qbits = 65 + max(1, len(terms)).bit_length()
    s.bits(q, qbits)
    s.bits(r, 64)
    return r


def gl_sub(s: Synthesizer, a: int, b: int) -> int:
    return gl_lincomb(s, [(1, a), (GL_P - 1, b)])


def gl3_add(s: Synthesizer, a: list[int], b: list[int]) -> list[int]:
    return [gl_add(s, a[i], b[i]) for i in range(3)]


def gl3_sub(s: Synthesizer, a: list[int], b: list[int]) -> list[int]:
    return [gl_sub(s, a[i], b[i]) for i in range(3)]


def gl3_muls(s: Synthesizer, a: list[int], c: int) -> list[int]:
    """GL3 times a constant base-field scalar."""
    return [gl_lincomb(s, [(c % GL_P, a[i])]) for i in range(3)]


def gl_assert_zero(s: Synthesizer, a: int) -> None:
    """a ≡ 0 mod p_GL for a < 2^64: a ∈ {0, p} ⟺ a·(a-p) = 0."""
    s.b.constrain({a: 1}, {a: 1, 0: R - GL_P}, {0: 0})


def gl_assert_eq(s: Synthesizer, a: int, b: int) -> None:
    gl_assert_zero(s, gl_sub(s, a, b))


def gl3_assert_eq(s: Synthesizer, a: list[int], b: list[int]) -> None:
    for i in range(3):
        gl_assert_eq(s, a[i], b[i])


def gl_inv(s: Synthesizer, a: int) -> int:
    """Witness inverse with in-circuit check a·ai ≡ 1 (a nonzero)."""
    v = s.w[a] % GL_P
    ai = s.alloc(pow(v, GL_P - 2, GL_P))
    s.bits(ai, 64)
    one = gl_mul(s, a, ai)
    gl_assert_zero(s, gl_lincomb(s, [(1, one)], GL_P - 1))  # one - 1 ≡ 0
    return ai


def gl3_inv(s: Synthesizer, a: list[int]) -> list[int]:
    """Witness GL3 inverse checked by a full gl3_mul == (1,0,0)."""
    from ..ops import refmodel as rm

    av = tuple(s.w[x] % GL_P for x in a)
    iv = rm.inv3(av)
    inv = [s.alloc(int(v)) for v in iv]
    for x in inv:
        s.bits(x, 64)
    prod = gl3_mul(s, a, inv)
    gl_assert_zero(s, gl_lincomb(s, [(1, prod[0])], GL_P - 1))
    gl_assert_zero(s, prod[1])
    gl_assert_zero(s, prod[2])
    return inv


def gl_canon(s: Synthesizer, a: int) -> int:
    """Reduce a (< 2^64) to the canonical residue < p_GL."""
    return gl_lincomb(s, [(1, a)])


def fr_to_gl3(s: Synthesizer, v: int) -> list[int]:
    """TranscriptBN128.get_field3 in-circuit: three 63-bit chunks of the
    squeezed Fr element (each < 2^63 < p_GL, so no reduction needed)."""
    bs = s.bits(v, 254)
    out = []
    for k in range(3):
        lc = {bs[63 * k + i]: 1 << i for i in range(63)}
        out.append(s.lin(lc))
    return out


def fr_bits_low(s: Synthesizer, v: int, n: int) -> list[int]:
    """The low 252 bits of a squeezed element (query-index extraction)."""
    return s.bits(v, 254)[:n]
