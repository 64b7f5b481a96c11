"""STARK proof container + JSON serialization.

Mirrors the reference's in-memory FRIProof and its JSON field naming
(src/starkpil/fri/friProof.hpp:14-236, Proofs::proof2json at :177):
root1..root4, evals, per-step s{i}_root / s{i}_vals{t} / s{i}_siblings{t},
finalPol, publics.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np


@dataclasses.dataclass
class MerkleQuery:
    values: np.ndarray    # opened leaf row (width,)
    siblings: np.ndarray  # (levels, 4)


@dataclasses.dataclass
class LayerQueries:
    root: np.ndarray | None           # None for layer 0 (roots live in root1..4)
    queries: list                      # per query: list[MerkleQuery] (5 trees at
    # layer 0 — cm1..cm4 + const; a single MerkleQuery at deeper layers)


@dataclasses.dataclass
class StarkProof:
    roots: list          # 4 arrays (4,) — cm1..cm4 roots
    evals: list          # per evMap entry: (3,) ints
    fri: list            # list[LayerQueries], index = FRI step
    final_pol: np.ndarray  # (2^lastBits, 3)
    publics: list        # ints
    # metadata for self-description
    n_queries: int
    fri_steps: list
    hash_type: str = "GL"

    def to_json(self) -> str:
        def arr(a):
            if isinstance(a, (list, tuple)) and a and isinstance(a[0], (list, tuple)):
                return [[str(int(x)) for x in row] for row in a]
            if isinstance(a, int):
                return [str(a)]
            return [str(int(v)) for v in np.ravel(np.asarray(a))]

        obj = {
            "root1": arr(self.roots[0]),
            "root2": arr(self.roots[1]),
            "root3": arr(self.roots[2]),
            "root4": arr(self.roots[3]),
            "evals": [[str(int(x)) for x in e] for e in self.evals],
            "finalPol": [[str(int(x)) for x in row] for row in np.asarray(self.final_pol)],
            "publics": [str(int(p)) for p in self.publics],
            "nQueries": self.n_queries,
            "steps": list(self.fri_steps),
            "hashType": self.hash_type,
            "fri": [],
        }
        for si, layer in enumerate(self.fri):
            lobj = {}
            if layer.root is not None:
                lobj[f"s{si}_root"] = arr(layer.root)
            if si == 0:
                for t in range(len(layer.queries[0])):
                    lobj[f"s0_vals{t + 1}"] = [arr(q[t].values) for q in layer.queries]
                    lobj[f"s0_siblings{t + 1}"] = [arr(q[t].siblings) for q in layer.queries]
            else:
                lobj[f"s{si}_vals"] = [arr(q.values) for q in layer.queries]
                lobj[f"s{si}_siblings"] = [arr(q.siblings) for q in layer.queries]
            obj["fri"].append(lobj)
        return json.dumps(obj)

    @classmethod
    def from_json(cls, s: str) -> "StarkProof":
        obj = json.loads(s)
        hash_type = obj.get("hashType", "GL")
        bn = hash_type == "BN128"

        def arr(a, shape=None):
            x = np.array([int(v) for v in a], dtype=np.uint64)
            return x.reshape(shape) if shape else x

        def root_of(a):
            return int(a[0]) if bn else arr(a)

        def sib_of(a):
            if bn:  # list of per-level sibling lists (big Fr ints)
                return [[int(x) for x in row] for row in a]
            return arr(a).reshape(-1, 4)

        steps = obj["steps"]
        fri = []
        for si, lobj in enumerate(obj["fri"]):
            root = root_of(lobj[f"s{si}_root"]) if f"s{si}_root" in lobj else None
            queries = []
            if si == 0:
                n_trees = len([k for k in lobj if k.startswith("s0_vals")])
                nq = len(lobj["s0_vals1"])
                for qi in range(nq):
                    row = []
                    for t in range(n_trees):
                        row.append(MerkleQuery(arr(lobj[f"s0_vals{t + 1}"][qi]),
                                               sib_of(lobj[f"s0_siblings{t + 1}"][qi])))
                    queries.append(row)
            else:
                for v, sb in zip(lobj[f"s{si}_vals"], lobj[f"s{si}_siblings"]):
                    queries.append(MerkleQuery(arr(v), sib_of(sb)))
            fri.append(LayerQueries(root, queries))
        return cls(
            roots=[root_of(obj[f"root{i}"]) for i in range(1, 5)],
            evals=[tuple(int(x) for x in e) for e in obj["evals"]],
            fri=fri,
            final_pol=np.array([[int(x) for x in row] for row in obj["finalPol"]],
                               dtype=np.uint64),
            publics=[int(p) for p in obj["publics"]],
            n_queries=obj["nQueries"],
            fri_steps=steps,
            hash_type=hash_type,
        )
