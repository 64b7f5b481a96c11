"""Node/program store behind the SMT.

Reference: src/hashdb/database.cpp (PostgreSQL nodes/program tables with an
in-memory cache and batched multiWrite). The TPU framework's default backend
is an in-process dict with optional file persistence — the role PostgreSQL
plays for the reference is out of scope for proving performance, and the
interface is factored so a real KV/SQL backend can be dropped in (the gRPC
HashDB service uses this same interface remotely).

Keys are 4-tuples of Goldilocks ints (node hashes); node values are lists of
12 field elements (8 data + 4 capacity flag, SURVEY.md App. D); programs are
byte strings keyed the same way.
"""

from __future__ import annotations

import json
import os
import threading


def _k(key) -> str:
    return "%016x%016x%016x%016x" % tuple(int(v) for v in key)


class Database:
    """Thread-safe node/program store with write-through file persistence."""

    def __init__(self, path: str | None = None):
        self._nodes: dict[str, list[int]] = {}
        self._programs: dict[str, bytes] = {}
        self._log: list[tuple] = []  # (kind, key) write log for GetFlushData
        self._lock = threading.Lock()
        self._path = path
        if path and os.path.exists(path):
            self._load(path)

    # -- nodes ---------------------------------------------------------------

    def read(self, key) -> list[int] | None:
        with self._lock:
            v = self._nodes.get(_k(key))
            return list(v) if v is not None else None

    def write(self, key, value: list[int]) -> None:
        # 12 = 8 inputs + 4 capacity; the reference's input-JSON db also
        # carries bare 8-element value preimages (capacity 0 implied)
        assert len(value) in (8, 12)
        if len(value) == 8:
            value = list(value) + [0, 0, 0, 0]
        with self._lock:
            ks = _k(key)
            self._nodes[ks] = [int(x) for x in value]
            self._log.append(("node", ks))

    # -- programs (contract bytecode keyed by poseidon linear hash) ----------

    def get_program(self, key) -> bytes | None:
        with self._lock:
            return self._programs.get(_k(key))

    def set_program(self, key, data: bytes) -> None:
        with self._lock:
            ks = _k(key)
            self._programs[ks] = bytes(data)
            self._log.append(("program", ks))

    # -- write log (reference: flush-data replication feed) -------------------

    def mark(self) -> int:
        with self._lock:
            return len(self._log)

    def entries_since(self, mark: int) -> dict:
        with self._lock:
            nodes, programs = {}, {}
            for kind, ks in self._log[mark:]:
                if kind == "node":
                    nodes[ks] = list(self._nodes.get(ks, []))
                else:
                    programs[ks] = self._programs.get(ks, b"")
            return {"nodes": nodes, "programs": programs}

    def clear(self) -> None:
        with self._lock:
            self._nodes.clear()
            self._programs.clear()
            self._log.clear()

    # -- bulk / persistence ----------------------------------------------------

    def multi_write(self, nodes: dict, programs: dict | None = None) -> None:
        """Batched flush (reference: multiWrite, src/hashdb/multi_write.cpp)."""
        with self._lock:
            for key, value in nodes.items():
                ks = _k(key) if not isinstance(key, str) else key
                self._nodes[ks] = [int(x) for x in value]
                self._log.append(("node", ks))
            for key, data in (programs or {}).items():
                ks = _k(key) if not isinstance(key, str) else key
                self._programs[ks] = bytes(data)
                self._log.append(("program", ks))

    def save(self, path: str | None = None) -> None:
        path = path or self._path
        assert path, "no persistence path configured"
        with self._lock:
            blob = {
                "nodes": self._nodes,
                "programs": {k: v.hex() for k, v in self._programs.items()},
            }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(blob, f)
        os.replace(tmp, path)

    def _load(self, path: str) -> None:
        with open(path) as f:
            blob = json.load(f)
        self._nodes = {k: [int(x) for x in v] for k, v in blob["nodes"].items()}
        self._programs = {k: bytes.fromhex(v) for k, v in blob["programs"].items()}

    def __len__(self) -> int:
        return len(self._nodes)
