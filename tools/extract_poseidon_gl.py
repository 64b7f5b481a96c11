"""Extract the Poseidon-Goldilocks constants from the reference's generated
verifier-circuit code (reference: src/starkpil/starkRecursiveF/chelpers/
recursivef.chelpers.step3.cpp) by symbolic interpretation.

The generated code is straight-line Goldilocks::{mul,add,sub} statements.
We interpret it symbolically: every expression is a linear combination over
"atoms" + a constant, where an atom is a committed-pol variable, a
constant-pol variable, or an opaque nonlinear product node.  Literal
constants then appear as linear-combination coefficients, which lets us
recover the round-constant schedule and linear-layer matrices exactly.
"""
import re, sys
from collections import defaultdict

P = (1 << 64) - (1 << 32) + 1

class Lin:
    """c0 + sum coeff[a] * atom_a  over GF(P)."""
    __slots__ = ("c", "m")
    def __init__(self, c=0, m=None):
        self.c = c % P
        self.m = m or {}
    def __add__(s, o):
        m = dict(s.m)
        for k, v in o.m.items():
            m[k] = (m.get(k, 0) + v) % P
        return Lin(s.c + o.c, {k: v for k, v in m.items() if v})
    def __sub__(s, o):
        m = dict(s.m)
        for k, v in o.m.items():
            m[k] = (m.get(k, 0) - v) % P
        return Lin(s.c - o.c, {k: v for k, v in m.items() if v})
    def scale(s, f):
        f %= P
        return Lin(s.c * f, {k: (v * f) % P for k, v in s.m.items()})
    def is_const(s):
        return not s.m
    def __repr__(s):
        parts = []
        if s.c: parts.append(str(s.c))
        for k, v in s.m.items():
            parts.append(f"{v}*{k}")
        return " + ".join(parts) or "0"

def interpret(body, products):
    """products: dict giving names to product atoms, populated as we go."""
    env = {}
    def parse_operand(tok):
        tok = tok.strip()
        m = re.match(r'Goldilocks::fromU64\((\d+)ULL\)', tok)
        if m: return Lin(int(m.group(1)))
        m = re.match(r'params\.pols\[(\d+)\s*\+\s*i\*(\d+)\]', tok)
        if m: return Lin(0, {f"pol{m.group(1)}s{m.group(2)}": 1})
        m = re.match(r'params\.pols\[(\d+)\s*\+\s*\(i\+1\)\*(\d+)\]', tok)
        if m: return Lin(0, {f"pol{m.group(1)}s{m.group(2)}n": 1})
        m = re.match(r'params\.pConstPols->getElement\((\d+),\s*i\)', tok)
        if m: return Lin(0, {f"K{m.group(1)}": 1})
        m = re.match(r'params\.pConstPols->getElement\((\d+),\s*\(i\+1\)%?\w*\)', tok)
        if m: return Lin(0, {f"K{m.group(1)}n": 1})
        if tok in env: return env[tok]
        raise ValueError(f"unknown operand: {tok!r}")
    writes = []
    for stmt in re.finditer(r'Goldilocks::(mul|add|sub)\(([^;]*)\);', body):
        op = stmt.group(1)
        args = [a.strip() for a in split_args(stmt.group(2))]
        dst, a, b = args[0], parse_operand(args[1]), parse_operand(args[2])
        if op == "add": r = a + b
        elif op == "sub": r = a - b
        else:
            if a.is_const(): r = b.scale(a.c)
            elif b.is_const(): r = a.scale(b.c)
            else:
                key = ("mul", frozenset([repr(a), repr(b)]))
                if key not in products:
                    products[key] = f"q{len(products)}"
                    products["_def_" + products[key]] = (a, b)
                r = Lin(0, {products[key]: 1})
        if dst.startswith("params.pols"):
            writes.append((dst, r))
            # also store so later reads see it
            m = re.match(r'params\.pols\[(\d+)\s*\+\s*i\*(\d+)\]', dst)
            if m:
                env_key = dst
                env[env_key] = Lin(0, {f"pol{m.group(1)}s{m.group(2)}": 1})
        else:
            env[dst] = r
    return env, writes

def split_args(s):
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == ',' and depth == 0:
            out.append(''.join(cur)); cur = []
        else:
            if ch == '(': depth += 1
            elif ch == ')': depth -= 1
            cur.append(ch)
    out.append(''.join(cur))
    return out

if __name__ == "__main__":
    src = open('/root/reference/src/starkpil/starkRecursiveF/chelpers/recursivef.chelpers.step3.cpp').read()
    body = src[src.index('step3_first'):src.index('step3_i(')]
    products = {}
    env, writes = interpret(body, products)
    print(f"{len(writes)} writes, {sum(1 for k in products if not isinstance(k,str) or not k.startswith('_def_'))} product atoms")
    for dst, r in writes[:10]:
        s = repr(r)
        print(dst, "=", s[:200])
