"""Command-AST evaluation for ROM free inputs and cmdBefore/cmdAfter.

Reference: src/main_sm/fork_9/main/eval_command.cpp (3.8k LoC) — commands are
small ASTs attached to ROM lines (freeInTag, cmdBefore, cmdAfter) that the
executor evaluates on the host to produce free-input values and side effects
(variables, logs). The AST JSON schema is the rom.json one: {"op": ...} with
op ∈ {number, declareVar/setVar/getVar, getReg, functionCall, add..shr, if,
getMemValue} (rom_command.hpp:78-108).

Values are Python ints (the reference's mpz scalars; intermediates may be
negative) or, for fea-returning functions, an 8-tuple of field elements.
Function calls dispatch through `FUNCS`; the implemented subset covers the
control/arithmetic helpers plus the secp256k1 field helpers used by the
ecrecover flow — others can be registered by callers.
"""

from __future__ import annotations

from ..ops import goldilocks as gl

P = gl.P
MASK256 = (1 << 256) - 1

# secp256k1 parameters (for inverseFpEc/inverseFnEc/sqrtFpEc/point helpers)
FPEC = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
FNEC = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141


class CommandError(Exception):
    pass


def _scalar(v) -> int:
    """Collapse an fea result to a scalar where a scalar is required."""
    if isinstance(v, tuple):
        out = 0
        for i, fe in enumerate(v):
            out |= int(fe) << (32 * i)
        return out
    return v


def eval_command(ctx, cmd: dict):
    """Evaluate one command AST; returns int | 8-tuple (fea) | None."""
    op = cmd["op"]
    f = _OPS.get(op)
    if f is None:
        raise CommandError(f"unimplemented command op {op!r}")
    return f(ctx, cmd)


def _values(ctx, cmd, n=None):
    vals = [_scalar(eval_command(ctx, v)) for v in cmd["values"]]
    if n is not None and len(vals) != n:
        raise CommandError(f"{cmd['op']}: expected {n} operands")
    return vals


# -- core ops ---------------------------------------------------------------

def _op_number(ctx, cmd):
    return int(cmd["num"])


def _op_declare_var(ctx, cmd):
    ctx.vars[cmd["varName"]] = 0
    return 0


def _op_set_var(ctx, cmd):
    name = cmd["values"][0]["varName"]
    v = eval_command(ctx, cmd["values"][1])
    ctx.vars[name] = v
    return v


def _op_get_var(ctx, cmd):
    try:
        return ctx.vars[cmd["varName"]]
    except KeyError:
        raise CommandError(f"undeclared var {cmd['varName']!r}") from None


def _op_get_reg(ctx, cmd):
    return ctx.get_reg(cmd["regName"])


def _op_function_call(ctx, cmd):
    name = cmd["funcName"]
    fn = FUNCS.get(name)
    if fn is None:
        raise CommandError(f"unimplemented function {name!r}")
    return fn(ctx, [eval_command(ctx, p) for p in cmd.get("params", ())])


def _op_if(ctx, cmd):
    c = _scalar(eval_command(ctx, cmd["values"][0]))
    return eval_command(ctx, cmd["values"][1 if c else 2])


def _op_get_mem_value(ctx, cmd):
    return ctx.get_mem(int(cmd["offset"]), bool(cmd.get("useCTX", 0)))


_BINOPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a // b,
    "mod": lambda a, b: a % b,
    "or": lambda a, b: int(bool(a) or bool(b)),
    "and": lambda a, b: int(bool(a) and bool(b)),
    "gt": lambda a, b: int(a > b),
    "ge": lambda a, b: int(a >= b),
    "lt": lambda a, b: int(a < b),
    "le": lambda a, b: int(a <= b),
    "eq": lambda a, b: int(a == b),
    "ne": lambda a, b: int(a != b),
    "bitand": lambda a, b: a & b,
    "bitor": lambda a, b: a | b,
    "bitxor": lambda a, b: a ^ b,
    "shl": lambda a, b: (a << b) & MASK256,
    "shr": lambda a, b: a >> b,
}

_OPS = {
    "number": _op_number,
    "declareVar": _op_declare_var,
    "setVar": _op_set_var,
    "getVar": _op_get_var,
    "getReg": _op_get_reg,
    "functionCall": _op_function_call,
    "if": _op_if,
    "getMemValue": _op_get_mem_value,
    "neg": lambda ctx, cmd: -_values(ctx, cmd, 1)[0],
    "not": lambda ctx, cmd: int(not _values(ctx, cmd, 1)[0]),
    "bitnot": lambda ctx, cmd: _values(ctx, cmd, 1)[0] ^ MASK256,
}
for _name, _fn in _BINOPS.items():
    _OPS[_name] = (lambda ctx, cmd, _f=_fn:
                   _f(*_values(ctx, cmd, 2)))


# -- function-call registry ---------------------------------------------------

def _f_before_last(ctx, params):
    # fea: -1 until step N-2, then 0 — drives the finalWait JMPN spin
    # (eval_command.cpp:1578-1605)
    fe0 = 0 if ctx.step >= ctx.n - 2 else P - 1
    return (fe0, 0, 0, 0, 0, 0, 0, 0)


def _f_cond(ctx, params):
    # returns fea -1 if param != 0 else 0 (used as JMPN condition)
    v = _scalar(params[0])
    return (P - 1 if v else 0, 0, 0, 0, 0, 0, 0, 0)


def _f_exp(ctx, params):
    a, b = _scalar(params[0]), _scalar(params[1])
    return pow(a, b)  # unbounded, like mpz_pow


def _f_store_log(ctx, params):
    ctx.logs.append(tuple(_scalar(p) for p in params))
    return 0


def _mem_align_write(m0: int, m1: int, value: int, offset: int):
    """Write 32 bytes of `value` at byte `offset` of the 64-byte window
    M0‖M1 (big-endian byte addressing); returns the new (M0, M1)."""
    wb = bytearray(m0.to_bytes(32, "big") + m1.to_bytes(32, "big"))
    vb = value.to_bytes(32, "big")
    wb[offset:offset + 32] = vb
    return int.from_bytes(wb[:32], "big"), int.from_bytes(wb[32:], "big")


def _f_mem_align_wr_w0_full(ctx, params):
    m0, value, offset = (_scalar(p) % (1 << 256) for p in params)
    # W1 content does not affect W0's result
    return _mem_align_write(m0, 0, value, offset)[0]


def _f_mem_align_wr_w1_full(ctx, params):
    m1, value, offset = (_scalar(p) % (1 << 256) for p in params)
    w0, w1 = _mem_align_write(0, m1, value, offset)
    return w1


def _f_mem_align_wr8_w0(ctx, params):
    m0, value, offset = (_scalar(p) % (1 << 256) for p in params)
    wb = bytearray(m0.to_bytes(32, "big"))
    wb[offset] = value & 0xFF
    return int.from_bytes(wb, "big")


def _f_inverse_fp_ec(ctx, params):
    a = _scalar(params[0]) % FPEC
    if a == 0:
        raise CommandError("inverseFpEc: zero")
    return pow(a, FPEC - 2, FPEC)


def _f_inverse_fn_ec(ctx, params):
    a = _scalar(params[0]) % FNEC
    if a == 0:
        raise CommandError("inverseFnEc: zero")
    return pow(a, FNEC - 2, FNEC)


def _f_sqrt_fp_ec(ctx, params):
    a = _scalar(params[0]) % FPEC
    r = pow(a, (FPEC + 1) // 4, FPEC)
    if r * r % FPEC != a:
        # non-residue sentinel, mirrors eval_command's sqrtFpEc contract
        return MASK256
    return min(r, FPEC - r)


def _f_sqrt_fp_ec_parity(ctx, params):
    a = _scalar(params[0]) % FPEC
    parity = _scalar(params[1]) & 1
    r = pow(a, (FPEC + 1) // 4, FPEC)
    if r * r % FPEC != a:
        return MASK256
    return r if (r & 1) == parity else FPEC - r


def _ec_add(x1, y1, x2, y2):
    if x1 == x2 and (y1 + y2) % FPEC == 0:
        raise CommandError("ec point at infinity")
    if x1 == x2 and y1 == y2:
        s = (3 * x1 * x1) * pow(2 * y1, FPEC - 2, FPEC) % FPEC
    else:
        s = (y2 - y1) * pow(x2 - x1, FPEC - 2, FPEC) % FPEC
    x3 = (s * s - x1 - x2) % FPEC
    y3 = (s * (x1 - x3) - y1) % FPEC
    return x3, y3


def _f_x_add_point_ec(ctx, params):
    x1, y1, x2, y2 = (_scalar(p) % FPEC for p in params)
    return _ec_add(x1, y1, x2, y2)[0]


def _f_y_add_point_ec(ctx, params):
    x1, y1, x2, y2 = (_scalar(p) % FPEC for p in params)
    return _ec_add(x1, y1, x2, y2)[1]


def _f_x_dbl_point_ec(ctx, params):
    x1, y1 = (_scalar(p) % FPEC for p in params)
    return _ec_add(x1, y1, x1, y1)[0]


def _f_y_dbl_point_ec(ctx, params):
    x1, y1 = (_scalar(p) % FPEC for p in params)
    return _ec_add(x1, y1, x1, y1)[1]


FUNCS = {
    "beforeLast": _f_before_last,
    "cond": _f_cond,
    "exp": _f_exp,
    "log": lambda ctx, params: 0,
    "storeLog": _f_store_log,
    "eventLog": lambda ctx, params: 0,
    "loadScalar": lambda ctx, params: _scalar(params[0]),
    "getTimestamp": lambda ctx, params: ctx.input.get("timestamp", 0),
    "getTxs": lambda ctx, params: ctx.get_txs(_scalar(params[0]),
                                              _scalar(params[1])),
    "getTxsLen": lambda ctx, params: len(ctx.input.get("batchL2Data", b"")),
    "getSequencerAddr": lambda ctx, params: ctx.input.get("sequencerAddr", 0),
    "getGlobalExitRoot": lambda ctx, params: ctx.input.get("globalExitRoot", 0),
    "bitwise_and": lambda ctx, params: _scalar(params[0]) & _scalar(params[1]),
    "bitwise_or": lambda ctx, params: _scalar(params[0]) | _scalar(params[1]),
    "bitwise_xor": lambda ctx, params: _scalar(params[0]) ^ _scalar(params[1]),
    "bitwise_not": lambda ctx, params: _scalar(params[0]) ^ MASK256,
    "comp_lt": lambda ctx, params: int(_scalar(params[0]) < _scalar(params[1])),
    "comp_gt": lambda ctx, params: int(_scalar(params[0]) > _scalar(params[1])),
    "comp_eq": lambda ctx, params: int(_scalar(params[0]) == _scalar(params[1])),
    "memAlignWR_W0": _f_mem_align_wr_w0_full,
    "memAlignWR_W1": _f_mem_align_wr_w1_full,
    "memAlignWR8_W0": _f_mem_align_wr8_w0,
    "inverseFpEc": _f_inverse_fp_ec,
    "inverseFnEc": _f_inverse_fn_ec,
    "sqrtFpEc": _f_sqrt_fp_ec,
    "sqrtFpEcParity": _f_sqrt_fp_ec_parity,
    "xAddPointEc": _f_x_add_point_ec,
    "yAddPointEc": _f_y_add_point_ec,
    "xDblPointEc": _f_x_dbl_point_ec,
    "yDblPointEc": _f_y_dbl_point_ec,
}
