"""BN254 layer (fields/curves/MSM/FFT/pairing) + Groth16 end-to-end.

The role of the reference's rapidsnark + ffiasm stack and of snarkjs
verification (runtime/README.md): prove a small R1CS and verify the pairing
equation in-stack."""

import random

import pytest

from zkevm_prover_tpu.ops import bn254 as bn
from zkevm_prover_tpu.snark import R1CS, groth16_prove, groth16_setup, groth16_verify


def test_curve_groups():
    assert bn.g1_is_on_curve(bn.G1_GEN)
    assert bn.g2_is_on_curve(bn.G2_GEN)
    assert bn.g1_mul(bn.G1_GEN, bn.R) is bn.INF
    assert bn.g2_mul(bn.G2_GEN, bn.R) is bn.INF
    # group law sanity
    p2 = bn.g1_add(bn.G1_GEN, bn.G1_GEN)
    assert p2 == bn.g1_double(bn.G1_GEN) == bn.g1_mul(bn.G1_GEN, 2)


def test_msm_matches_naive():
    rng = random.Random(0)
    pts = [bn.g1_mul(bn.G1_GEN, rng.randrange(bn.R)) for _ in range(17)]
    sc = [rng.randrange(bn.R) for _ in range(17)]
    naive = bn.INF
    for p, s in zip(pts, sc):
        naive = bn.g1_add(naive, bn.g1_mul(p, s))
    assert bn.g1_msm(pts, sc) == naive


def test_fr_fft_roundtrip_and_convolution():
    rng = random.Random(1)
    xs = [rng.randrange(bn.R) for _ in range(32)]
    assert bn.fr_fft(bn.fr_fft(xs), inverse=True) == xs
    # FFT evaluates the polynomial at roots of unity
    w = bn.fr_w(5)
    evals = bn.fr_fft(xs)
    x0 = pow(w, 3, bn.R)
    want = sum(c * pow(x0, i, bn.R) for i, c in enumerate(xs)) % bn.R
    assert evals[3] == want


@pytest.fixture(scope="module")
def cubic_setup():
    # prove knowledge of x with x^3 + x + 5 == out
    b = R1CS.builder(n_public=1)
    out_sig = 1
    x = b.alloc()
    x2 = b.mul(x, x)
    x3 = b.mul(x2, x)
    b.constrain({x3: 1, x: 1, 0: 5}, {0: 1}, {out_sig: 1})
    r1cs = b.build()
    return r1cs, groth16_setup(r1cs)


def test_groth16_roundtrip(cubic_setup):
    r1cs, setup = cubic_setup
    xv = 7
    out = (xv**3 + xv + 5) % bn.R
    w = [1, out, xv, xv * xv % bn.R, pow(xv, 3, bn.R)]
    assert r1cs.is_satisfied(w)
    proof = groth16_prove(setup, w)
    assert groth16_verify(setup, [out], proof)


def test_groth16_rejects_wrong_public(cubic_setup):
    r1cs, setup = cubic_setup
    xv = 7
    out = (xv**3 + xv + 5) % bn.R
    w = [1, out, xv, xv * xv % bn.R, pow(xv, 3, bn.R)]
    proof = groth16_prove(setup, w)
    assert not groth16_verify(setup, [(out + 1) % bn.R], proof)


def test_groth16_rejects_bad_witness(cubic_setup):
    r1cs, setup = cubic_setup
    w = [1, 5, 2, 4, 8]  # 8 + 2 + 5 = 15 != 5
    assert not r1cs.is_satisfied(w)
    with pytest.raises(AssertionError):
        groth16_prove(setup, w)
