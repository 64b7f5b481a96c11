"""Constraint-expression IR and its JAX compiler.

This replaces the reference's generated "chelpers" constraint evaluators
(src/starkpil/zkevm/chelpers/*.cpp — 244k LoC of unrolled/bytecoded AVX code,
SURVEY.md §2.4): instead of generating C++ per instance, we keep the PIL
expression DAG symbolic and *trace* it once through JAX; XLA fuses the whole
step into one kernel with rows as the vector axis (the TPU analogue of the
reference's NROWS_STEPS_=4/8 AVX row batching, src/config/definitions.hpp:85-92).

Node kinds mirror the reference's StepType enum (src/starkpil/stark_info.hpp:
167-187): cm, const, challenge, public, number, x, Zi, eval, xDivXSubXi,
xDivXSubWXi, plus add/sub/mul/neg ops.

The same DAG evaluates in three binding modes:
  * trace domain  ("n")    — arrays of shape (N,) / (N, 3)
  * extended coset ("2ns") — arrays of shape (NExt,) / (NExt, 3), row shift
                              of `prime` is the blowup stride
  * point mode             — python ints / 3-tuples (used by the verifier at xi
                              and at FRI query points)

Values are Goldilocks elements; dim 1 = base field, dim 3 = cubic extension.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any

import jax.numpy as jnp
import numpy as np

# A combined batch AIR folds ~1000 constraints into one DAG; the
# recursive walkers (eval_array tracing, point evaluation in the
# verifier) need stack depth ~2 nodes per constraint. CPython 3.11+
# keeps pure-Python recursion off the C stack, so a high limit is safe.
sys.setrecursionlimit(max(sys.getrecursionlimit(), 100_000))

from ..ops import gl3
from ..ops import goldilocks as gl
from ..ops import refmodel as rm

# ---------------------------------------------------------------------------
# IR nodes
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Expr:
    """Base class; operator sugar builds the DAG."""

    def __add__(self, other):
        return Add(self, _wrap(other))

    def __radd__(self, other):
        return Add(_wrap(other), self)

    def __sub__(self, other):
        return Sub(self, _wrap(other))

    def __rsub__(self, other):
        return Sub(_wrap(other), self)

    def __mul__(self, other):
        return Mul(self, _wrap(other))

    def __rmul__(self, other):
        return Mul(_wrap(other), self)

    def __neg__(self):
        return Neg(self)


def _wrap(v) -> "Expr":
    if isinstance(v, Expr):
        return v
    if isinstance(v, int):
        return Number(v % gl.P)
    raise TypeError(f"cannot use {type(v)} in an expression")


@dataclasses.dataclass(frozen=True)
class Cm(Expr):
    id: int
    prime: bool = False


@dataclasses.dataclass(frozen=True)
class Const(Expr):
    id: int
    prime: bool = False


@dataclasses.dataclass(frozen=True)
class Challenge(Expr):
    idx: int  # reference slots: 0=u 1=defVal 2=gamma 3=betta 4=a 5=v1 6=v2 7=xi


@dataclasses.dataclass(frozen=True)
class Public(Expr):
    idx: int


@dataclasses.dataclass(frozen=True)
class Number(Expr):
    value: int


@dataclasses.dataclass(frozen=True)
class X(Expr):
    """The domain point (shift·w^i on the extended coset; w^i on trace)."""


@dataclasses.dataclass(frozen=True)
class Zi(Expr):
    """1 / Z_H(x) on the extended coset (reference: src/starkpil/zhInv.cpp)."""


@dataclasses.dataclass(frozen=True)
class Eval(Expr):
    """Opened value #idx of the evMap (verifier / FRI-poly construction)."""

    idx: int


@dataclasses.dataclass(frozen=True)
class XDivXSubXi(Expr):
    """x / (x - xi) on the extended coset (reference: starks.cpp:352-366)."""


@dataclasses.dataclass(frozen=True)
class XDivXSubWXi(Expr):
    """x / (x - w·xi) on the extended coset."""


@dataclasses.dataclass(frozen=True)
class Add(Expr):
    a: Expr
    b: Expr


@dataclasses.dataclass(frozen=True)
class Sub(Expr):
    a: Expr
    b: Expr


@dataclasses.dataclass(frozen=True)
class Mul(Expr):
    a: Expr
    b: Expr


@dataclasses.dataclass(frozen=True)
class Neg(Expr):
    a: Expr


# ---------------------------------------------------------------------------
# Static analysis
# ---------------------------------------------------------------------------


def walk(e: Expr):
    """Yield every node of the DAG once (post-order)."""
    seen: set[int] = set()
    stack = [e]
    out = []
    while stack:
        n = stack.pop()
        if id(n) in seen:
            continue
        seen.add(id(n))
        out.append(n)
        for f in ("a", "b"):
            c = getattr(n, f, None)
            if isinstance(c, Expr):
                stack.append(c)
    return out


def degree(e: Expr, cm_deg) -> int:
    """Constraint degree in N-units (cm/const/x count 1, Zi counts -1).

    `cm_deg(id)` lets stage-2/3 columns report their own degree (all 1 here).
    Used by setup to size the quotient (qDeg), like pil-stark's expression
    degree bookkeeping.
    """
    memo: dict[int, int] = {}

    def rec(n) -> int:
        k = id(n)
        if k in memo:
            return memo[k]
        if isinstance(n, (Cm,)):
            d = cm_deg(n.id)
        elif isinstance(n, (Const, X)):
            d = 1
        elif isinstance(n, Zi):
            d = -1
        elif isinstance(n, (Challenge, Public, Number, Eval, XDivXSubXi, XDivXSubWXi)):
            d = 0
        elif isinstance(n, (Add, Sub)):
            d = max(rec(n.a), rec(n.b))
        elif isinstance(n, Mul):
            d = rec(n.a) + rec(n.b)
        elif isinstance(n, Neg):
            d = rec(n.a)
        else:
            raise TypeError(type(n))
        memo[k] = d
        return d

    return rec(e)


def uses_extension(e: Expr, cm_dim) -> bool:
    return any(
        isinstance(n, (Challenge, Eval, XDivXSubXi, XDivXSubWXi))
        or (isinstance(n, Cm) and cm_dim(n.id) == 3)
        for n in walk(e)
    )


# ---------------------------------------------------------------------------
# JAX (array) evaluator
# ---------------------------------------------------------------------------


class ArrayBindings:
    """Row-vectorized bindings for one evaluation domain.

    cm(id) / const(id) return (rows,) or (rows, 3) uint64 arrays;
    challenges: (8, 3); publics: (nPublics,) base; x / zi / xdivxsubxi /
    xdivxsubwxi: arrays or None. `prime_stride` is 1 on the trace domain and
    the blowup on the extended coset (next-row shift, starks.cpp evmap's
    `prime ? (i + extend) % NExt` indexing).
    """

    def __init__(
        self,
        *,
        cm,
        const,
        challenges=None,
        publics=None,
        x=None,
        zi=None,
        xdivxsubxi=None,
        xdivxsubwxi=None,
        evals=None,
        prime_stride: int = 1,
    ):
        self.cm = cm
        self.const = const
        self.challenges = challenges
        self.publics = publics
        self.x = x
        self.zi = zi
        self.xdivxsubxi = xdivxsubxi
        self.xdivxsubwxi = xdivxsubwxi
        self.evals = evals
        self.prime_stride = prime_stride


def _dim(v) -> int:
    return 3 if (hasattr(v, "ndim") and v.ndim >= 1 and v.shape[-1] == 3) else 1


def _to3(v):
    return gl3.from_base(v) if _dim(v) == 1 else v


def _arr_add(a, b):
    # add/sub are componentwise: promote mixed dims to ext and broadcast
    if _dim(a) != _dim(b):
        a, b = _to3(a), _to3(b)
    return gl.add(a, b)


def _arr_sub(a, b):
    if _dim(a) != _dim(b):
        a, b = _to3(a), _to3(b)
    return gl.sub(a, b)


def _arr_mul(a, b):
    da, db = _dim(a), _dim(b)
    if da == 1 and db == 1:
        return gl.mul(a, b)
    if da == 3 and db == 3:
        return gl3.mul(a, b)
    if da == 3:
        return gl3.mul_base(a, b)
    return gl3.mul_base(b, a)


def eval_array(e: Expr, b: ArrayBindings):
    """Evaluate the DAG over arrays; returns (rows,) or (rows, 3)."""
    memo: dict[int, Any] = {}

    def shift(v, prime):
        if not prime:
            return v
        if isinstance(v, np.ndarray):
            return np.roll(v, -b.prime_stride, axis=0)
        return jnp.roll(v, -b.prime_stride, axis=0)

    def rec(n):
        k = id(n)
        if k in memo:
            return memo[k]
        if isinstance(n, Cm):
            v = shift(b.cm(n.id), n.prime)
        elif isinstance(n, Const):
            v = shift(b.const(n.id), n.prime)
        elif isinstance(n, Challenge):
            v = b.challenges[n.idx]
        elif isinstance(n, Public):
            v = b.publics[n.idx]
        elif isinstance(n, Number):
            v = np.uint64(n.value)
        elif isinstance(n, X):
            v = b.x
        elif isinstance(n, Zi):
            v = b.zi
        elif isinstance(n, XDivXSubXi):
            v = b.xdivxsubxi
        elif isinstance(n, XDivXSubWXi):
            v = b.xdivxsubwxi
        elif isinstance(n, Eval):
            v = b.evals[n.idx]
        elif isinstance(n, Add):
            v = _arr_add(rec(n.a), rec(n.b))
        elif isinstance(n, Sub):
            v = _arr_sub(rec(n.a), rec(n.b))
        elif isinstance(n, Mul):
            v = _arr_mul(rec(n.a), rec(n.b))
        elif isinstance(n, Neg):
            v = gl.neg(rec(n.a))
        else:
            raise TypeError(type(n))
        memo[k] = v
        return v

    return rec(e)


# ---------------------------------------------------------------------------
# Point (python-int) evaluator — verifier side
# ---------------------------------------------------------------------------


class PointBindings:
    """Scalar bindings at one point; values are ints or 3-tuples of ints."""

    def __init__(self, *, cm, const, challenges=None, publics=None, x=None,
                 zi=None, xdivxsubxi=None, xdivxsubwxi=None, evals=None):
        self.cm = cm
        self.const = const
        self.challenges = challenges
        self.publics = publics
        self.x = x
        self.zi = zi
        self.xdivxsubxi = xdivxsubxi
        self.xdivxsubwxi = xdivxsubwxi
        self.evals = evals


def _pt3(v):
    return v if isinstance(v, tuple) else (v % rm.P, 0, 0)


def _pt_op(a, b, fbase, fext):
    ta, tb = isinstance(a, tuple), isinstance(b, tuple)
    if not ta and not tb:
        return fbase(a, b)
    return fext(_pt3(a), _pt3(b))


def eval_point(e: Expr, b: PointBindings):
    """Evaluate the DAG at a single point with exact python ints."""
    memo: dict[int, Any] = {}

    def rec(n):
        k = id(n)
        if k in memo:
            return memo[k]
        if isinstance(n, Cm):
            v = b.cm(n.id, n.prime)
        elif isinstance(n, Const):
            v = b.const(n.id, n.prime)
        elif isinstance(n, Challenge):
            v = tuple(b.challenges[n.idx])
        elif isinstance(n, Public):
            v = b.publics[n.idx]
        elif isinstance(n, Number):
            v = n.value
        elif isinstance(n, X):
            v = b.x
        elif isinstance(n, Zi):
            v = b.zi
        elif isinstance(n, XDivXSubXi):
            v = b.xdivxsubxi
        elif isinstance(n, XDivXSubWXi):
            v = b.xdivxsubwxi
        elif isinstance(n, Eval):
            v = b.evals[n.idx]
        elif isinstance(n, Add):
            v = _pt_op(rec(n.a), rec(n.b), rm.add, rm.add3)
        elif isinstance(n, Sub):
            v = _pt_op(rec(n.a), rec(n.b), rm.sub, rm.sub3)
        elif isinstance(n, Mul):
            v = _pt_op(rec(n.a), rec(n.b), rm.mul, rm.mul3)
        elif isinstance(n, Neg):
            a = rec(n.a)
            v = tuple((-x) % rm.P for x in a) if isinstance(a, tuple) else (-a) % rm.P
        else:
            raise TypeError(type(n))
        memo[k] = v
        return v

    return rec(e)
