"""gRPC services (L7) — Aggregator / Executor / HashDB.

Framework counterpart of the reference's src/service/* + src/grpc (SURVEY.md
§2.6): the Executor and HashDB unary services, and the Aggregator bidi
stream that is the system's multi-prover scale-out mechanism (one stream per
prover; the aggregator fans out genBatchProof work and tree-reduces with
genAggregatedProof).

protobuf message classes are generated into `gen/` by plain protoc (messages
only); the method routing is registered through grpc's generic-handler API
(the runtime has no protoc grpc plugin), so the wire surface matches the
.proto service definitions exactly.
"""

from .hashdb_service import HashDBClient, serve_hashdb
from .executor_service import ExecutorClient, serve_executor
from .aggregator import AggregatorClient, MockAggregatorServer

__all__ = [
    "HashDBClient", "serve_hashdb",
    "ExecutorClient", "serve_executor",
    "AggregatorClient", "MockAggregatorServer",
]
