"""PaddingPG SM — Poseidon sponge linear hashes (program hashing).

Reference: src/sm/padding_pg/ (Poseidon-based linear hash padding feeding
PoseidonG, used for contract-bytecode hashing). This SM proves the
framework's `linear_hash` semantics (ops/poseidon_gl.py): chunks of 8 field
elements absorbed with the previous digest carried in the capacity.

Built on the PoseidonG permutation AIR (poseidon_g.add_permutation_
constraints) with chaining across 32-row groups:

  CONT (committed, boolean, group-constant): 1 when this group continues
  the previous group's message.
    fresh group:      CLK0·(1−CONT)·S_j = 0            for j in 8..11
    carried digest:   rows 30/31 copy the state (HOLD·(S'−S)=0 at rows
                      30,31 is gated to row 30 only; row 31 then holds the
                      final state), and at the 31→0 boundary
                      L31·CONT'·(S_j' − SB_{j-8-ish}) — concretely
                      L31·CONT'·(S'_{8+j} − S_j) = 0   for j in 0..3
  (the digest of a group is S_0..3 of its final-state row, which rows
  30→31 copy forward).

Digests are read at row 30 of each message's last group.
"""

from __future__ import annotations

import numpy as np

from ...ops import poseidon_constants as pc
from ...ops import refmodel as rm
from ...stark import expr as ex
from ...stark.air import AIR
from . import poseidon_g as pg

W = pg.W
GROUP = pg.GROUP
ROUNDS = pg.ROUNDS
RATE = 8
CAP = 4
P = rm.P


def build_air(n_bits: int) -> AIR:
    n = 1 << n_bits
    assert n % GROUP == 0
    air = AIR("padding_pg", n_bits)
    s = air.committed(*[f"S{j}" for j in range(W)])
    t = air.committed(*[f"T{j}" for j in range(W)])
    sb = air.committed(*[f"SB{j}" for j in range(W)])
    cont = air.committed("CONT")

    pg.add_permutation_constraints(air, s, t, sb, n)

    pos = np.arange(n, dtype=np.uint64) % GROUP
    CLK0 = air.constant("PCLK0", (pos == 0).astype(np.uint64))
    HOLD = air.constant("HOLD", (pos == ROUNDS).astype(np.uint64))  # row 30
    L31 = air.constant("L31", (pos == GROUP - 1).astype(np.uint64))
    air.constant("PGID", np.arange(n, dtype=np.uint64) // GROUP)
    nlast = np.ones(n, dtype=np.uint64)
    nlast[n - 1] = 0
    NL = air.constant("PNL", nlast)

    air.require_zero(cont * (cont - 1))
    # CONT group-constant
    air.require_zero(NL * (1 - L31) * (ex.Cm(cont.id, True) - cont))
    # rows 30 -> 31 copy the final state forward
    for j in range(W):
        air.require_zero(HOLD * (ex.Cm(s[j].id, True) - s[j]))
    # fresh groups start with zero capacity
    for j in range(RATE, W):
        air.require_zero(CLK0 * (1 - cont) * s[j])
    # continuing groups carry the previous digest into the capacity
    for j in range(CAP):
        air.require_zero(
            NL * L31 * ex.Cm(cont.id, True)
            * (ex.Cm(s[RATE + j].id, True) - s[j])
        )
    return air


def execute(actions: list[dict], n_bits: int) -> tuple[np.ndarray, list]:
    """actions: [{values: [field elements]}] — one linear hash each.

    Returns (trace, digests); each message occupies ceil(len/8) consecutive
    groups (min 1). Padding groups are fresh zero-chunk permutations.
    """
    n = 1 << n_bits
    n_groups = n // GROUP
    pos = rm.Poseidon(pc.round_constants(), pc.mds_matrix())

    # expand messages into (chunk, cont) group plans
    plan = []
    digests = []
    for act in actions:
        vals = [int(v) % P for v in act["values"]]
        # the sponge branch of linear_hash; width <= 4 is a plain copy there
        assert len(vals) > 4, "PaddingPG proves sponge hashes (len > 4)"
        digest = [0, 0, 0, 0]
        chunks = [vals[i : i + RATE] for i in range(0, max(len(vals), 1), RATE)]
        for ci, chunk in enumerate(chunks):
            chunk = chunk + [0] * (RATE - len(chunk))
            state = chunk + digest
            plan.append((state, 1 if ci else 0))
            digest = pos.permute(state)[:CAP]
        digests.append(digest)
    return _fill(plan, n_bits), digests


def execute_chunks(chunks: list[dict], n_bits: int) -> np.ndarray:
    """Combined-mode driver: lay the byte-front's per-block chunks at the
    group index equal to their block id (chunks: [{values(8),
    cont_digest(4), cont}] from padding_pg_byte.execute)."""
    plan = [(list(c["values"]) + list(c["cont_digest"]), int(c["cont"]))
            for c in chunks]
    return _fill(plan, n_bits)


def _fill(plan: list, n_bits: int) -> np.ndarray:
    n = 1 << n_bits
    n_groups = n // GROUP
    assert len(plan) <= n_groups, "too many chunks for domain"
    plan = list(plan)
    while len(plan) < n_groups:
        plan.append(([0] * W, 0))

    tr = np.zeros((n, 3 * W + 1), dtype=np.uint64)
    C = pc.round_constants()
    M = pc.mds_matrix()
    for g, (state, cont_flag) in enumerate(plan):
        st = list(state)
        base = g * GROUP
        for r in range(ROUNDS):
            x = [(st[j] + C[r * W + j]) % P for j in range(W)]
            cube = [pow(v, 3, P) for v in x]
            sbox = [cube[j] * cube[j] % P * x[j] % P for j in range(W)]
            out_sb = sbox if pg._full_round(r) else [sbox[0]] + x[1:]
            tr[base + r] = st + cube + out_sb + [cont_flag]
            st = [sum(M[i][j] * out_sb[j] for j in range(W)) % P
                  for i in range(W)]
        tr[base + ROUNDS, :W] = st          # row 30: final state
        tr[base + ROUNDS, 3 * W] = cont_flag
        tr[base + ROUNDS + 1, :W] = st      # row 31: held copy
        tr[base + ROUNDS + 1, 3 * W] = cont_flag
    return tr


def result(action: dict) -> list[int]:
    """Oracle: must equal ops/poseidon_gl.linear_hash / refmodel."""
    pos = rm.Poseidon(pc.round_constants(), pc.mds_matrix())
    return pos.linear_hash([int(v) % P for v in action["values"]])
