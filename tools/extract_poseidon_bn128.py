"""Extract the circomlib Poseidon-BN128 constant sets (t = 2..17) from the
reference's checked-in header (reference: src/poseidon_opt/constants_opt.hpp,
`Constants_opt::{C,M,P,S}`).

Elements are stored as 4 little-endian u64 limbs in Montgomery form
(ffiasm RawFr, R = 2^256 mod r); this script decodes them to canonical
integers and writes one gzipped JSON with the four tables per width.

Verification: tests/test_poseidon_reference.py pins poseidon([1,2]) (t=3)
to the well-known circomlib test vector, which exercises the same decode
path used for every width.
"""
import gzip, json, re, sys

r = 21888242871839275222246405745257275088548364400416034343698204186575808495617
R_MONT = (1 << 256) % r
R_INV = pow(R_MONT, r - 2, r)

SRC = "/root/reference/src/poseidon_opt/constants_opt.hpp"


def parse(src: str):
    text = open(src).read()
    out = {}
    for name in ("C", "M", "P", "S"):
        m = re.search(name + r"\s*=\s*", text)
        start = text.index("{", m.end())
        # walk to matching close brace
        depth = 0
        i = start
        while True:
            ch = text[i]
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        body = text[start : i + 1]
        out[name] = _parse_nested(body)
    return out


def _parse_nested(body: str):
    """Parse nested brace lists of {0x..,0x..,0x..,0x..} quadruples into
    nested Python lists of canonical ints."""
    pos = 0
    stack = [[]]
    n = len(body)
    while pos < n:
        ch = body[pos]
        if ch == "{":
            # is this a leaf quadruple? lookahead for a hex literal
            m = re.match(r"\{\s*0x", body[pos:])
            if m:
                end = body.index("}", pos)
                limbs = [int(x, 16) for x in re.findall(r"0x([0-9A-Fa-f]+)", body[pos:end])]
                assert len(limbs) == 4
                mont = limbs[0] | limbs[1] << 64 | limbs[2] << 128 | limbs[3] << 192
                stack[-1].append(mont * R_INV % r)
                pos = end + 1
                continue
            stack.append([])
            pos += 1
        elif ch == "}":
            done = stack.pop()
            stack[-1].append(done)
            pos += 1
        else:
            pos += 1
    assert len(stack) == 1 and len(stack[0]) == 1
    return stack[0][0]


def main():
    tables = parse(SRC)
    n_rounds_p = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]
    data = {"r": str(r), "widths": {}}
    for idx in range(16):
        t = idx + 2
        C = tables["C"][idx]
        M = tables["M"][idx]
        P = tables["P"][idx]
        S = tables["S"][idx]
        rp = n_rounds_p[idx]
        assert len(C) == 8 * t + rp, (t, len(C))
        assert len(M) == t and all(len(row) == t for row in M)
        assert len(P) == t and all(len(row) == t for row in P)
        assert len(S) == (2 * t - 1) * rp, (t, len(S))
        data["widths"][str(t)] = {
            "nRoundsP": rp,
            "C": [str(v) for v in C],
            "M": [[str(v) for v in row] for row in M],
            "P": [[str(v) for v in row] for row in P],
            "S": [str(v) for v in S],
        }
    out = "/root/repo/zkevm_prover_tpu/ops/data/poseidon_bn128.json.gz"
    with gzip.open(out, "wt") as f:
        json.dump(data, f)
    print("wrote", out)


if __name__ == "__main__":
    main()
