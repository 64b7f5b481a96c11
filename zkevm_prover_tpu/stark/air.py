"""AIR — the PIL-equivalent description of a state machine to prove.

The reference consumes PIL compiled offline by pil-stark's `setup` into
`*.starkinfo.json` + generated chelpers (SURVEY.md §2.4). Here the same
information is declared directly in Python: committed columns, constant
(preprocessed) columns, publics, polynomial identities, and the three
argument kinds of the eSTARK protocol — plookup (`f in t`), permutation
(`f is t`) and connection (PLONK-style copy constraints) — mirroring
pil-stark's puCtx / peCtx / ciCtx (src/starkpil/stark_info.hpp:103-137).

Boundary constraints are expressed PIL-style with constant selector columns
(e.g. `L1 * (a - :pub)`); `AIR.lagrange_first()` provides L1.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import goldilocks as gl
from . import expr as ex


@dataclasses.dataclass
class Lookup:
    """sel_f {f} in sel_t {t} — reference puCtx (plookup)."""

    f: list
    t: list
    sel_f: ex.Expr | None = None
    sel_t: ex.Expr | None = None


@dataclasses.dataclass
class Permutation:
    """sel_f {f} is sel_t {t} — reference peCtx."""

    f: list
    t: list
    sel_f: ex.Expr | None = None
    sel_t: ex.Expr | None = None


@dataclasses.dataclass
class Connection:
    """{pols} connect {sigma_consts} — reference ciCtx (copy constraints).

    `pols` are expressions (usually bare committed columns); `sigmas` are
    constant-column ids holding the image of k_i·x under the copy permutation,
    exactly the PLONK σ encoding.
    """

    pols: list
    sigmas: list


class AIR:
    def __init__(self, name: str, n_bits: int):
        self.name = name
        self.n_bits = n_bits
        self.n = 1 << n_bits
        self.cm_names: list[str] = []
        self.const_names: list[str] = []
        self.const_values: list[np.ndarray] = []
        self.publics: list[tuple[str, int, int]] = []  # (name, cm_id, row)
        self.constraints: list[ex.Expr] = []
        self.lookups: list[Lookup] = []
        self.permutations: list[Permutation] = []
        self.connections: list[Connection] = []
        self._l1_id: int | None = None

    # -- declarations -------------------------------------------------------

    def committed(self, *names: str):
        """Declare stage-1 committed columns; returns Cm handles."""
        out = []
        for nm in names:
            self.cm_names.append(nm)
            out.append(ex.Cm(len(self.cm_names) - 1))
        return out[0] if len(out) == 1 else tuple(out)

    def constant(self, name: str, values) -> ex.Const:
        arr = np.asarray(values, dtype=np.uint64)
        assert arr.shape == (self.n,), f"constant {name}: want ({self.n},)"
        self.const_names.append(name)
        self.const_values.append(arr)
        return ex.Const(len(self.const_names) - 1)

    def lagrange_first(self) -> ex.Const:
        """L1 constant column (1 at row 0), auto-registered once."""
        if self._l1_id is None:
            vals = np.zeros(self.n, dtype=np.uint64)
            vals[0] = 1
            c = self.constant("__L1", vals)
            self._l1_id = c.id
        return ex.Const(self._l1_id)

    def public(self, name: str, col: ex.Cm, row: int) -> ex.Public:
        """Declare a public = value of `col` at `row`; usable in constraints."""
        self.publics.append((name, col.id, row))
        return ex.Public(len(self.publics) - 1)

    # -- identities ----------------------------------------------------------

    def require_zero(self, e: ex.Expr):
        """Polynomial identity: e == 0 on every row."""
        self.constraints.append(e)

    def lookup(self, f, t, sel_f=None, sel_t=None):
        self.lookups.append(Lookup(list(f), list(t), sel_f, sel_t))

    def permutation(self, f, t, sel_f=None, sel_t=None):
        self.permutations.append(Permutation(list(f), list(t), sel_f, sel_t))

    def connection(self, pols, sigmas):
        self.connections.append(Connection(list(pols), list(sigmas)))

    # -- helpers -------------------------------------------------------------

    @property
    def n_cm1(self) -> int:
        return len(self.cm_names)

    @property
    def n_constants(self) -> int:
        return len(self.const_names)

    def domain_w(self) -> int:
        return gl.w(self.n_bits)
