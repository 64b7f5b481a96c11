"""grpc generic-handler plumbing (replaces protoc-generated *_pb2_grpc)."""

from __future__ import annotations

import os
import sys

import grpc

_GEN = os.path.join(os.path.dirname(__file__), "gen")
if _GEN not in sys.path:
    sys.path.insert(0, _GEN)


def _ser(msg):
    return msg.SerializeToString()


def unary(fn, req_cls):
    return grpc.unary_unary_rpc_method_handler(
        fn, request_deserializer=req_cls.FromString, response_serializer=_ser
    )


def stream_stream(fn, req_cls):
    return grpc.stream_stream_rpc_method_handler(
        fn, request_deserializer=req_cls.FromString, response_serializer=_ser
    )


def register(server: grpc.Server, service_name: str, handlers: dict) -> None:
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(service_name, handlers),)
    )


def unary_stub(channel: grpc.Channel, service: str, method: str, resp_cls):
    return channel.unary_unary(
        f"/{service}/{method}",
        request_serializer=_ser,
        response_deserializer=resp_cls.FromString,
    )


def stream_stub(channel: grpc.Channel, service: str, method: str, resp_cls):
    return channel.stream_stream(
        f"/{service}/{method}",
        request_serializer=_ser,
        response_deserializer=resp_cls.FromString,
    )
