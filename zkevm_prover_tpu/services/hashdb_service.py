"""HashDB gRPC server + remote client.

Reference: src/service/hashdb/hashdb_service.cpp (server over HashDB/
StateManager) and hashdb_remote.cpp (client); the local/remote factory
switch (hashdb_factory.cpp:13-27) is `make_hashdb` here.
"""

from __future__ import annotations

from concurrent import futures

import grpc

from ..hashdb import HashDB
from . import rpc
from .rpc import register, unary, unary_stub

import hashdb_pb2 as pb  # noqa: E402  (path injected by rpc module)

SERVICE = "hashdb.v1.HashDBService"


def _fea(msg) -> tuple:
    return (msg.fe0, msg.fe1, msg.fe2, msg.fe3)


def _to_fea(t) -> pb.Fea4:
    return pb.Fea4(fe0=int(t[0]), fe1=int(t[1]), fe2=int(t[2]), fe3=int(t[3]))


class HashDBServiceImpl:
    def __init__(self, hashdb: HashDB | None = None):
        self.hashdb = hashdb if hashdb is not None else HashDB()

    def Set(self, req, ctx):
        if req.batch_uuid and req.batch_uuid not in self.hashdb.state._batches:
            self.hashdb.begin_batch(req.batch_uuid, _fea(req.old_root))
        r = self.hashdb.set(req.batch_uuid, req.tx, _fea(req.old_root),
                            _fea(req.key), int(req.value, 16),
                            req.persistence)
        return pb.SetResponse(
            old_root=_to_fea(r.old_root), new_root=_to_fea(r.new_root),
            old_value=hex(r.old_value), new_value=hex(r.new_value),
            mode=r.mode, result=0,
        )

    def Get(self, req, ctx):
        r = self.hashdb.get(req.batch_uuid, _fea(req.root), _fea(req.key))
        return pb.GetResponse(root=_to_fea(r.root), value=hex(r.value), result=0)

    def SetProgram(self, req, ctx):
        self.hashdb.set_program(req.batch_uuid, _fea(req.key), req.data,
                                req.persistence)
        return pb.SetProgramResponse(result=0)

    def GetProgram(self, req, ctx):
        data = self.hashdb.get_program(req.batch_uuid, _fea(req.key))
        if data is None:
            return pb.GetProgramResponse(result=1)
        return pb.GetProgramResponse(data=data, result=0)

    def Flush(self, req, ctx):
        fid, sent = self.hashdb.flush(req.batch_uuid, _fea(req.new_state_root))
        return pb.FlushResponse(flush_id=fid, stored_flush_id=sent, result=0)

    def GetFlushStatus(self, req, ctx):
        st = self.hashdb.get_flush_status()
        return pb.GetFlushStatusResponse(
            stored_flush_id=st["storedFlushId"],
            last_flush_id=st["lastFlushId"],
            pending_to_flush_nodes=st["pendingToFlushNodes"],
        )

    def CancelBatch(self, req, ctx):
        self.hashdb.cancel_batch(req.batch_uuid)
        return pb.CancelBatchResponse(result=0)

    def GetLatestStateRoot(self, req, ctx):
        return pb.GetLatestStateRootResponse(
            root=_to_fea(self.hashdb.get_latest_state_root()))

    def LoadDB(self, req, ctx):
        self.hashdb.load_db(
            {_fea(e.hash): list(e.value) for e in req.nodes})
        return pb.Empty()

    def LoadProgramDB(self, req, ctx):
        self.hashdb.load_program_db(
            {_fea(e.key): e.data for e in req.programs})
        return pb.Empty()

    def StartBlock(self, req, ctx):
        self.hashdb.start_block(req.batch_uuid, _fea(req.root))
        return pb.Empty()

    def FinishBlock(self, req, ctx):
        self.hashdb.finish_block(req.batch_uuid, _fea(req.root))
        return pb.Empty()

    def FinishTx(self, req, ctx):
        self.hashdb.finish_tx(req.batch_uuid, _fea(req.new_state_root),
                              req.persistence)
        return pb.Empty()

    def Purge(self, req, ctx):
        self.hashdb.purge(req.batch_uuid, _fea(req.new_state_root),
                          req.persistence)
        return pb.PurgeResponse(result=0)

    def GetFlushData(self, req, ctx):
        data = self.hashdb.get_flush_data(req.flush_id)
        nodes = [pb.NodeEntry(hash=_to_fea(tuple(int(k[i * 16:(i + 1) * 16],
                                                     16)
                                                 for i in range(4))),
                              value=v)
                 for k, v in data["nodes"].items()]
        programs = [
            pb.ProgramEntry(key=_to_fea(tuple(int(k[i * 16:(i + 1) * 16], 16)
                                              for i in range(4))), data=d)
            for k, d in data["programs"].items()]
        return pb.GetFlushDataResponse(nodes=nodes, programs=programs)

    def ConsolidateState(self, req, ctx):
        root, fid, stored = self.hashdb.consolidate_state(
            _fea(req.virtual_state_root), req.persistence)
        return pb.ConsolidateStateResponse(
            consolidated_state_root=_to_fea(root), flush_id=fid,
            stored_flush_id=stored, result=0)

    def ReadTree(self, req, ctx):
        entries = self.hashdb.read_tree(
            _fea(req.root), [_fea(k) for k in req.keys])
        return pb.ReadTreeResponse(entries=[
            pb.KeyValueLevel(key=_to_fea(e["key"]), value=hex(e["value"]),
                             level=e["level"]) for e in entries], result=0)

    def ResetDB(self, req, ctx):
        self.hashdb.reset_db()
        return pb.ResetDBResponse(result=0)


def serve_hashdb(port: int, hashdb: HashDB | None = None,
                 max_workers: int = 8) -> grpc.Server:
    impl = HashDBServiceImpl(hashdb)
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    register(server, SERVICE, {
        "Set": unary(impl.Set, pb.SetRequest),
        "Get": unary(impl.Get, pb.GetRequest),
        "SetProgram": unary(impl.SetProgram, pb.SetProgramRequest),
        "GetProgram": unary(impl.GetProgram, pb.GetProgramRequest),
        "Flush": unary(impl.Flush, pb.FlushRequest),
        "GetFlushStatus": unary(impl.GetFlushStatus, pb.Empty),
        "CancelBatch": unary(impl.CancelBatch, pb.CancelBatchRequest),
        "GetLatestStateRoot": unary(impl.GetLatestStateRoot, pb.Empty),
        "LoadDB": unary(impl.LoadDB, pb.LoadDBRequest),
        "LoadProgramDB": unary(impl.LoadProgramDB, pb.LoadProgramDBRequest),
        "FinishTx": unary(impl.FinishTx, pb.FinishTxRequest),
        "StartBlock": unary(impl.StartBlock, pb.BlockRequest),
        "FinishBlock": unary(impl.FinishBlock, pb.BlockRequest),
        "Purge": unary(impl.Purge, pb.PurgeRequest),
        "GetFlushData": unary(impl.GetFlushData, pb.GetFlushDataRequest),
        "ConsolidateState": unary(impl.ConsolidateState,
                                  pb.ConsolidateStateRequest),
        "ReadTree": unary(impl.ReadTree, pb.ReadTreeRequest),
        "ResetDB": unary(impl.ResetDB, pb.Empty),
    })
    server.add_insecure_port(f"[::]:{port}")
    server.start()
    server.impl = impl
    return server


class HashDBClient:
    """Remote HashDB speaking the same interface as the local facade
    (reference: HashDBRemote, src/service/hashdb/hashdb_remote.cpp)."""

    def __init__(self, target: str):
        self._channel = grpc.insecure_channel(target)
        s = SERVICE
        self._set = unary_stub(self._channel, s, "Set", pb.SetResponse)
        self._get = unary_stub(self._channel, s, "Get", pb.GetResponse)
        self._setp = unary_stub(self._channel, s, "SetProgram", pb.SetProgramResponse)
        self._getp = unary_stub(self._channel, s, "GetProgram", pb.GetProgramResponse)
        self._flush = unary_stub(self._channel, s, "Flush", pb.FlushResponse)
        self._status = unary_stub(self._channel, s, "GetFlushStatus",
                                  pb.GetFlushStatusResponse)
        self._cancel = unary_stub(self._channel, s, "CancelBatch",
                                  pb.CancelBatchResponse)

    def set(self, batch_uuid, tx, old_root, key, value, persistence=0):
        resp = self._set(pb.SetRequest(
            batch_uuid=batch_uuid, tx=tx, old_root=_to_fea(old_root),
            key=_to_fea(key), value=hex(value), persistence=persistence,
        ))
        import types

        return types.SimpleNamespace(
            old_root=_fea(resp.old_root), new_root=_fea(resp.new_root),
            old_value=int(resp.old_value, 16), new_value=int(resp.new_value, 16),
            mode=resp.mode,
        )

    def get(self, batch_uuid, root, key):
        resp = self._get(pb.GetRequest(batch_uuid=batch_uuid,
                                       root=_to_fea(root), key=_to_fea(key)))
        import types

        return types.SimpleNamespace(root=_fea(resp.root),
                                     value=int(resp.value, 16))

    def set_program(self, batch_uuid, key, data, persistence=0):
        self._setp(pb.SetProgramRequest(batch_uuid=batch_uuid,
                                        key=_to_fea(key), data=data,
                                        persistence=persistence))

    def get_program(self, batch_uuid, key):
        resp = self._getp(pb.GetProgramRequest(batch_uuid=batch_uuid,
                                               key=_to_fea(key)))
        return resp.data if resp.result == 0 else None

    def flush(self, batch_uuid, new_state_root=(0, 0, 0, 0)):
        resp = self._flush(pb.FlushRequest(batch_uuid=batch_uuid,
                                           new_state_root=_to_fea(new_state_root)))
        return resp.flush_id, resp.stored_flush_id

    def get_flush_status(self):
        resp = self._status(pb.Empty())
        return {
            "storedFlushId": resp.stored_flush_id,
            "lastFlushId": resp.last_flush_id,
            "pendingToFlushNodes": resp.pending_to_flush_nodes,
        }

    def cancel_batch(self, batch_uuid):
        self._cancel(pb.CancelBatchRequest(batch_uuid=batch_uuid))

    def _stub(self, method, resp_cls):
        return unary_stub(self._channel, SERVICE, method, resp_cls)

    def get_latest_state_root(self):
        resp = self._stub("GetLatestStateRoot",
                          pb.GetLatestStateRootResponse)(pb.Empty())
        return _fea(resp.root)

    def load_db(self, nodes: dict):
        self._stub("LoadDB", pb.Empty)(pb.LoadDBRequest(nodes=[
            pb.NodeEntry(hash=_to_fea(h), value=list(v))
            for h, v in nodes.items()]))

    def load_program_db(self, programs: dict):
        self._stub("LoadProgramDB", pb.Empty)(pb.LoadProgramDBRequest(
            programs=[pb.ProgramEntry(key=_to_fea(k), data=d)
                      for k, d in programs.items()]))

    def start_block(self, batch_uuid, root):
        self._stub("StartBlock", pb.Empty)(pb.BlockRequest(
            batch_uuid=batch_uuid, root=_to_fea(root)))

    def finish_tx(self, batch_uuid, root, persistence=0):
        self._stub("FinishTx", pb.Empty)(pb.FinishTxRequest(
            batch_uuid=batch_uuid, new_state_root=_to_fea(tuple(root)),
            persistence=persistence))

    def finish_block(self, batch_uuid, root):
        self._stub("FinishBlock", pb.Empty)(pb.BlockRequest(
            batch_uuid=batch_uuid, root=_to_fea(root)))

    def purge(self, batch_uuid, new_state_root, persistence=0):
        self._stub("Purge", pb.PurgeResponse)(pb.PurgeRequest(
            batch_uuid=batch_uuid, new_state_root=_to_fea(new_state_root),
            persistence=persistence))

    def get_flush_data(self, flush_id: int):
        resp = self._stub("GetFlushData", pb.GetFlushDataResponse)(
            pb.GetFlushDataRequest(flush_id=flush_id))
        return {"nodes": {_fea(e.hash): list(e.value) for e in resp.nodes},
                "programs": {_fea(e.key): e.data for e in resp.programs}}

    def consolidate_state(self, virtual_root, persistence=1):
        resp = self._stub("ConsolidateState", pb.ConsolidateStateResponse)(
            pb.ConsolidateStateRequest(
                virtual_state_root=_to_fea(virtual_root),
                persistence=persistence))
        return (_fea(resp.consolidated_state_root), resp.flush_id,
                resp.stored_flush_id)

    def read_tree(self, root, keys):
        resp = self._stub("ReadTree", pb.ReadTreeResponse)(
            pb.ReadTreeRequest(root=_to_fea(root),
                               keys=[_to_fea(k) for k in keys]))
        return [{"key": _fea(e.key), "value": int(e.value, 16),
                 "level": e.level} for e in resp.entries]

    def reset_db(self):
        self._stub("ResetDB", pb.ResetDBResponse)(pb.Empty())


def make_hashdb(url: str = "local"):
    """Factory: local singleton vs gRPC remote (hashdb_factory.cpp:13-27)."""
    if url in ("local", ""):
        return HashDB()
    return HashDBClient(url)
