"""eSTARK setup: turn an AIR into a complete proving/verification plan.

Plays the role of pil-stark's `setup` (whose output the reference parses from
`*.starkinfo.json`, src/starkpil/stark_info.cpp:21): assigns stage-2 (h1/h2),
stage-3 (z) and stage-4 (quotient) columns, builds the phase expressions, the
opening map (evMap) and the FRI-polynomial combination, and fixes the FRI
folding schedule.

Challenge slots follow the reference transcript schedule exactly
(SURVEY.md §App-B; src/starkpil/starks.cpp:60-342):
  0=u, 1=defVal (phase 2), 2=gamma, 3=betta (phase 3),
  4=quotient combiner (phase 4), 7=xi, 5=v1, 6=v2 (phase 5).

Argument reductions (reconstructed protocol; the reference's concrete
formulas live in generated chelpers bytecode we do not copy):
  plookup  — plookup-paper (beta, gamma) grand product over (f, t, h1, h2)
  permutation — selected multiset equality via (compressed + gamma) factors
  connection  — PLONK sigma copy-constraint grand product with k_i = shift^i
"""

from __future__ import annotations

import dataclasses

from ..ops import goldilocks as gl
from . import expr as ex
from .air import AIR

U = ex.Challenge(0)
DEFVAL = ex.Challenge(1)
GAMMA = ex.Challenge(2)
BETTA = ex.Challenge(3)
QC = ex.Challenge(4)
V1 = ex.Challenge(5)
V2 = ex.Challenge(6)
XI = ex.Challenge(7)

N_CHALLENGES = 8


@dataclasses.dataclass
class ColInfo:
    stage: int  # 1..4 (commitment round)
    pos: int    # base-column offset inside the stage section
    dim: int    # 1 = base field, 3 = cubic extension
    name: str


@dataclasses.dataclass
class LookupPlan:
    f_exp: ex.Expr
    t_exp: ex.Expr
    h1_id: int
    h2_id: int
    z_id: int
    num: ex.Expr
    den: ex.Expr
    dim: int


@dataclasses.dataclass
class GrandProductPlan:  # permutation / connection
    z_id: int
    num: ex.Expr
    den: ex.Expr
    # partial-product columns [(col_id, defining expr)] — wide connection
    # arguments (PLONK wire counts > 3) chunk their factor products into
    # stage-3 committed columns so the z transition stays low-degree
    aux: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class EvEntry:
    type: str  # "cm" | "const"
    id: int
    prime: bool


def _horner(cols, ch):
    acc = None
    for c in cols:
        acc = c if acc is None else acc * ch + c
    return acc


class StarkSetup:
    """Complete plan for proving one AIR. Immutable after construction."""

    def __init__(self, airdef: AIR, *, blowup_bits: int | None = None,
                 n_queries: int = 32, fri_fold_bits: int = 4,
                 fri_last_bits: int | None = None, hash_type: str = "GL"):
        assert hash_type in ("GL", "BN128")
        self.hash_type = hash_type
        self.air = airdef
        self.n_bits = airdef.n_bits
        self.n = airdef.n

        # ---- column table: stage-1 columns first --------------------------
        self.cols: list[ColInfo] = [
            ColInfo(1, i, 1, nm) for i, nm in enumerate(airdef.cm_names)
        ]

        def new_col(stage: int, dim: int, name: str, width: list[int]) -> int:
            self.cols.append(ColInfo(stage, width[0], dim, name))
            width[0] += dim
            return len(self.cols) - 1

        w2, w3 = [0], [0]

        # ---- phase 2: plookup compressions + h1/h2 ------------------------
        self.lookups: list[LookupPlan] = []
        for li, lk in enumerate(airdef.lookups):
            t_exp = _horner(lk.t, U)
            if lk.sel_t is not None:
                t_exp = lk.sel_t * (t_exp - DEFVAL) + DEFVAL
            f_exp = _horner(lk.f, U)
            if lk.sel_f is not None:
                f_exp = lk.sel_f * (f_exp - t_exp) + t_exp
            # h1/h2 live in the extension iff the compressed f/t expressions
            # do (multi-column tuples pull in the U challenge; sel_t pulls in
            # DEFVAL; a sel_f over single base columns stays in the base
            # field and phase 2 emits (N, 1) columns for it)
            cm1_dim = lambda cid: 1
            dim = 3 if (ex.uses_extension(f_exp, cm1_dim)
                        or ex.uses_extension(t_exp, cm1_dim)) else 1
            h1 = new_col(2, dim, f"pu{li}.h1", w2)
            h2 = new_col(2, dim, f"pu{li}.h2", w2)
            z = new_col(3, 3, f"pu{li}.z", w3)
            # plookup grand product (Gabizon-Williamson (beta,gamma) form)
            one_b = BETTA + 1
            gb = GAMMA * one_b
            num = (f_exp + GAMMA) * (t_exp + BETTA * _prime(t_exp) + gb) * one_b
            den = (ex.Cm(h1) + BETTA * ex.Cm(h2) + gb) * (ex.Cm(h2) + BETTA * ex.Cm(h1, True) + gb)
            self.lookups.append(LookupPlan(f_exp, t_exp, h1, h2, z, num, den, dim))

        # ---- phase 3: permutation / connection z columns -------------------
        self.permutations: list[GrandProductPlan] = []
        for pi, pe in enumerate(airdef.permutations):
            f_exp = _horner(pe.f, BETTA)
            t_exp = _horner(pe.t, BETTA)
            num = (pe.sel_f * (f_exp + GAMMA - 1) + 1) if pe.sel_f is not None else f_exp + GAMMA
            den = (pe.sel_t * (t_exp + GAMMA - 1) + 1) if pe.sel_t is not None else t_exp + GAMMA
            z = new_col(3, 3, f"pe{pi}.z", w3)
            self.permutations.append(GrandProductPlan(z, num, den))

        self.connections: list[GrandProductPlan] = []
        CHUNK = 3  # factors folded per partial product (keeps degree <= 4)
        for ci, cn in enumerate(airdef.connections):
            assert len(cn.pols) == len(cn.sigmas)
            fn_list, fd_list = [], []
            for i, (p, s) in enumerate(zip(cn.pols, cn.sigmas)):
                k_i = pow(gl.shift(), i, gl.P)
                fn_list.append(p + BETTA * (ex.X() * k_i) + GAMMA)
                fd_list.append(p + BETTA * s + GAMMA)

            def _prod(fs):
                e = fs[0]
                for f in fs[1:]:
                    e = e * f
                return e

            aux: list = []
            if len(fn_list) <= CHUNK:
                num_f, den_f = _prod(fn_list), _prod(fd_list)
            else:
                num_parts, den_parts = [], []
                for off in range(0, len(fn_list), CHUNK):
                    for fs, parts, tag in (
                            (fn_list[off:off + CHUNK], num_parts, "n"),
                            (fd_list[off:off + CHUNK], den_parts, "d")):
                        cid = new_col(3, 3, f"ci{ci}.pp{tag}{off}", w3)
                        aux.append((cid, _prod(fs)))
                        parts.append(ex.Cm(cid))
                num_f, den_f = _prod(num_parts), _prod(den_parts)
            z = new_col(3, 3, f"ci{ci}.z", w3)
            self.connections.append(GrandProductPlan(z, num_f, den_f, aux))

        # ---- constraint list (user identities + argument identities) ------
        l1 = airdef.lagrange_first()
        self.constraints: list[ex.Expr] = list(airdef.constraints)
        for plan in self.lookups:
            zc, zp = ex.Cm(plan.z_id), ex.Cm(plan.z_id, True)
            self.constraints.append(l1 * (zc - 1))
            self.constraints.append(zp * plan.den - zc * plan.num)
        for plan in self.permutations + self.connections:
            for cid, e in plan.aux:
                self.constraints.append(ex.Cm(cid) - e)
            zc, zp = ex.Cm(plan.z_id), ex.Cm(plan.z_id, True)
            self.constraints.append(l1 * (zc - 1))
            self.constraints.append(zp * plan.den - zc * plan.num)

        # ---- quotient sizing -----------------------------------------------
        cm_deg = lambda cid: 1
        max_deg = max((ex.degree(c, cm_deg) for c in self.constraints), default=1)
        self.q_deg = max(1, max_deg - 1)
        min_blowup = max(1, (self.q_deg - 1).bit_length() if self.q_deg > 1 else 1)
        self.blowup_bits = blowup_bits if blowup_bits is not None else min_blowup
        assert (1 << self.blowup_bits) >= self.q_deg, "blowup too small for qDeg"
        self.n_bits_ext = self.n_bits + self.blowup_bits
        self.n_ext = 1 << self.n_bits_ext
        self.q_dim = 3

        # combined constraint C = Horner(constraints, challenge 4); q = C·Zi
        c_exp = None
        for c in self.constraints:
            c_exp = c if c_exp is None else c_exp * QC + c
        self.c_combined = c_exp if c_exp is not None else ex.Number(0)
        self.c_exp = self.c_combined * ex.Zi()  # the quotient on the coset

        # stage-4 (quotient split) columns
        w4 = [0]
        self.q_ids = [new_col(4, 3, f"q{p}", w4) for p in range(self.q_deg)]

        self.section_width = {1: airdef.n_cm1, 2: w2[0], 3: w3[0], 4: w4[0]}

        # ---- evMap ----------------------------------------------------------
        # every cm/const leaf referenced by any constraint, plus the q columns
        self.ev_map: list[EvEntry] = []
        self._ev_index: dict[tuple[str, int, bool], int] = {}

        def add_ev(typ: str, cid: int, prime: bool):
            key = (typ, cid, prime)
            if key not in self._ev_index:
                self._ev_index[key] = len(self.ev_map)
                self.ev_map.append(EvEntry(typ, cid, prime))

        for c in self.constraints:
            for node in ex.walk(c):
                if isinstance(node, ex.Cm):
                    add_ev("cm", node.id, node.prime)
                elif isinstance(node, ex.Const):
                    add_ev("const", node.id, node.prime)
        for qid in self.q_ids:
            add_ev("cm", qid, False)

        # ---- FRI polynomial: Horner over evMap entries ----------------------
        acc1, acc2 = None, None  # non-prime (v1) and prime (v2) groups
        for k, e in enumerate(self.ev_map):
            leaf = ex.Cm(e.id) if e.type == "cm" else ex.Const(e.id)
            term = leaf - ex.Eval(k)
            if e.prime:
                acc2 = term if acc2 is None else acc2 * V2 + term
            else:
                acc1 = term if acc1 is None else acc1 * V1 + term
        fri = ex.Number(0)
        if acc1 is not None:
            fri = fri + acc1 * ex.XDivXSubXi()
        if acc2 is not None:
            fri = fri + acc2 * ex.XDivXSubWXi()
        self.fri_exp = fri

        # ---- FRI schedule (starkStruct.steps) --------------------------------
        self.n_queries = n_queries
        if fri_last_bits is None:
            fri_last_bits = min(self.n_bits_ext, max(self.blowup_bits + 2, 5))
        steps = [self.n_bits_ext]
        while steps[-1] - fri_fold_bits >= fri_last_bits:
            steps.append(steps[-1] - fri_fold_bits)
        self.fri_steps = steps  # nBits per layer, layer 0 = full ext domain

    # -- helpers --------------------------------------------------------------

    def ev_idx(self, typ: str, cid: int, prime: bool) -> int:
        return self._ev_index[(typ, cid, prime)]

    @property
    def n_cols(self) -> int:
        return len(self.cols)

    def stage_cols(self, stage: int) -> list[int]:
        return [i for i, c in enumerate(self.cols) if c.stage == stage]

    def describe(self) -> dict:
        """starkinfo.json-shaped summary (reference schema field names)."""
        return {
            "starkStruct": {
                "nBits": self.n_bits,
                "nBitsExt": self.n_bits_ext,
                "nQueries": self.n_queries,
                "verificationHashType": self.hash_type,
                "steps": [{"nBits": b} for b in self.fri_steps],
            },
            "nConstants": self.air.n_constants,
            "nPublics": len(self.air.publics),
            "nCm1": self.section_width[1],
            "nCm2": self.section_width[2],
            "nCm3": self.section_width[3],
            "nCm4": self.section_width[4],
            "qDeg": self.q_deg,
            "qDim": self.q_dim,
            "evMap": [dataclasses.asdict(e) for e in self.ev_map],
        }


def _prime(e: ex.Expr) -> ex.Expr:
    """Shift an expression to the next row (rewrite leaf prime flags)."""
    if isinstance(e, ex.Cm):
        return ex.Cm(e.id, True)
    if isinstance(e, ex.Const):
        return ex.Const(e.id, True)
    if isinstance(e, (ex.Challenge, ex.Public, ex.Number, ex.Eval)):
        return e
    if isinstance(e, ex.Add):
        return ex.Add(_prime(e.a), _prime(e.b))
    if isinstance(e, ex.Sub):
        return ex.Sub(_prime(e.a), _prime(e.b))
    if isinstance(e, ex.Mul):
        return ex.Mul(_prime(e.a), _prime(e.b))
    if isinstance(e, ex.Neg):
        return ex.Neg(_prime(e.a))
    raise TypeError(f"cannot shift {type(e)}")
