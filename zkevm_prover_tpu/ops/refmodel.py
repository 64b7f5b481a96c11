"""Pure-Python (arbitrary-precision int) model of the crypto primitives.

This is the framework's internal cross-check oracle — the role the JS
pil-stark stack plays for the reference C++ prover (SURVEY.md §4.6: the
reference verifies its outputs against an independent implementation). Every
JAX/Pallas kernel in `ops/` has a property test against this model.

It is also used host-side where work is tiny and strictly sequential
(Fiat-Shamir transcript bookkeeping), exactly as the reference keeps its
transcript scalar (src/starkpil/transcript/transcript.cpp).
"""

from __future__ import annotations

P = 0xFFFFFFFF_00000001


# --- base field --------------------------------------------------------------

def add(a: int, b: int) -> int:
    return (a + b) % P


def sub(a: int, b: int) -> int:
    return (a - b) % P


def mul(a: int, b: int) -> int:
    return (a * b) % P


def inv(a: int) -> int:
    return pow(a, P - 2, P) if a else 0


# --- cubic extension F_p[x]/(x^3 - x - 1) ------------------------------------

def add3(a, b):
    return tuple((x + y) % P for x, y in zip(a, b))


def sub3(a, b):
    return tuple((x - y) % P for x, y in zip(a, b))


def mul3(a, b):
    c0 = a[0] * b[0]
    c1 = a[0] * b[1] + a[1] * b[0]
    c2 = a[0] * b[2] + a[1] * b[1] + a[2] * b[0]
    c3 = a[1] * b[2] + a[2] * b[1]
    c4 = a[2] * b[2]
    return ((c0 + c3) % P, (c1 + c3 + c4) % P, (c2 + c4) % P)


def mul3s(a, s: int):
    return tuple((x * s) % P for x in a)


def inv3(a):
    """Inverse by solving M(a)·y = e0 with the adjugate (see gl3.inv)."""
    a0, a1, a2 = a
    m11 = (a0 + a2) % P
    m12 = (a1 + a2) % P
    cof00 = (m11 * m11 - m12 * a1) % P
    cof10 = (-(a1 * m11 - m12 * a2)) % P
    cof20 = (a1 * a1 - m11 * a2) % P
    det = (a0 * cof00 + a2 * cof10 + a1 * cof20) % P
    d = inv(det)
    return (cof00 * d % P, cof10 * d % P, cof20 * d % P)


def pow3(a, e: int):
    r = (1, 0, 0)
    b = a
    while e:
        if e & 1:
            r = mul3(r, b)
        b = mul3(b, b)
        e >>= 1
    return r


# --- NTT ----------------------------------------------------------------------

def ntt(xs: list[int], w_root: int) -> list[int]:
    """O(N log N) recursive NTT, natural order in/out. Test sizes only."""
    n = len(xs)
    if n == 1:
        return list(xs)
    w2 = w_root * w_root % P
    even = ntt(xs[0::2], w2)
    odd = ntt(xs[1::2], w2)
    out = [0] * n
    wk = 1
    for k in range(n // 2):
        t = wk * odd[k] % P
        out[k] = (even[k] + t) % P
        out[k + n // 2] = (even[k] - t) % P
        wk = wk * w_root % P
    return out


def intt(xs: list[int], w_root: int) -> list[int]:
    n = len(xs)
    y = ntt(xs, pow(w_root, P - 2, P))
    n_inv = pow(n, P - 2, P)
    return [v * n_inv % P for v in y]


# --- Poseidon-Goldilocks (width 12, x^7, RF=8, RP=22) -------------------------

class Poseidon:
    """Unoptimized-spec Poseidon permutation over 12 Goldilocks elements.

    Per round: add round constants (all lanes), apply x^7 S-box (all lanes in
    full rounds, lane 0 only in partial rounds), multiply by the MDS matrix.
    Constants are injected (see ops/poseidon_constants.py).
    """

    def __init__(self, C: list[int], M: list[list[int]], rf: int = 8, rp: int = 22, t: int = 12):
        assert len(C) == (rf + rp) * t
        self.C, self.M, self.rf, self.rp, self.t = C, M, rf, rp, t

    def permute(self, state):
        t = self.t
        s = [v % P for v in state]
        assert len(s) == t
        half = self.rf // 2
        n_rounds = self.rf + self.rp
        for r in range(n_rounds):
            s = [(s[i] + self.C[r * t + i]) % P for i in range(t)]
            if half <= r < half + self.rp:
                s[0] = self._sbox(s[0])
            else:
                s = [self._sbox(v) for v in s]
            s = [sum(self.M[i][j] * s[j] for j in range(t)) % P for i in range(t)]
        return s

    @staticmethod
    def _sbox(x: int) -> int:
        x3 = x * x % P * x % P
        return x3 * x3 % P * x % P

    # hash_full_result / linear_hash / merkle semantics reconstructed from the
    # reference call sites (transcript.cpp:23,46; merkleTreeGL.cpp:37-44).
    def hash_full(self, inputs12):
        return self.permute(inputs12)

    def linear_hash(self, values):
        """Sponge over chunks of 8 with the previous digest as capacity."""
        n = len(values)
        if n <= 4:
            return list(values) + [0] * (4 - n)
        digest = [0, 0, 0, 0]
        for off in range(0, n, 8):
            chunk = list(values[off:off + 8])
            chunk += [0] * (8 - len(chunk))
            digest = self.permute(chunk + digest)[:4]
        return digest

    @staticmethod
    def pack_bytes(data: bytes) -> list[int]:
        """Reference byte padding for the linear poseidon over bytes
        (padding_pg_executor.cpp:38-41): append 0x01, zero-fill to a
        multiple of 56, OR 0x80 into the final byte; pack 7 bytes per
        field element little-endian (bytesPerElement=7, nElements=8)."""
        padded = bytearray(data)
        padded.append(0x01)
        while len(padded) % 56:
            padded.append(0)
        padded[-1] |= 0x80
        return [int.from_bytes(padded[off:off + 7], "little")
                for off in range(0, len(padded), 7)]

    def linear_hash_bytes(self, data: bytes):
        """The hashP digest (reference hashContractBytecode / PaddingPG):
        pad+pack bytes, then the chunk-of-8 sponge with the previous
        digest in the capacity lanes."""
        return self.linear_hash(self.pack_bytes(data))

    def hash_pair(self, left4, right4):
        return self.permute(list(left4) + list(right4) + [0, 0, 0, 0])[:4]
