"""Management / Write / Operations gRPC message schemas.

Byte-faithful descriptors (for the protowire codec) of the reference's
control-plane protos:

- /root/reference/generated_types/protos/influxdata/iox/management/v1/
  {service,database_rules,chunk,partition,jobs}.proto
- /root/reference/generated_types/protos/influxdata/iox/write/v1/
  service.proto
- google/longrunning/operations.proto + google/protobuf/{timestamp,
  duration,empty,any}.proto + google/rpc/status.proto (the public
  well-known types the service messages embed)

Only the wire schemas live here; request handling is rpc_management.py.
"""

from __future__ import annotations

from influxdb_iox_spark.protowire import Field

# -- google well-known types ------------------------------------------------

ANY = {1: Field("type_url", "string"), 2: Field("value", "bytes")}
EMPTY: dict[int, Field] = {}
TIMESTAMP = {1: Field("seconds", "int64"), 2: Field("nanos", "int32")}
DURATION = {1: Field("seconds", "int64"), 2: Field("nanos", "int32")}
RPC_STATUS = {
    1: Field("code", "int32"),
    2: Field("message", "string"),
    3: Field("details", "message", ANY, repeated=True),
}
# google.longrunning.Operation
OPERATION = {
    1: Field("name", "string"),
    2: Field("metadata", "message", ANY),
    3: Field("done", "bool"),
    4: Field("error", "message", RPC_STATUS),
    5: Field("response", "message", ANY),
}

# -- jobs.proto (OperationMetadata + job kinds) -----------------------------

DUMMY_JOB = {1: Field("nanos", "uint64", repeated=True)}
_CHUNK_JOB = {
    1: Field("db_name", "string"),
    2: Field("partition_key", "string"),
    3: Field("chunk_id", "uint32"),
    4: Field("table_name", "string"),
}
_CHUNKS_JOB = {
    1: Field("db_name", "string"),
    2: Field("partition_key", "string"),
    3: Field("chunks", "uint32", repeated=True),
    4: Field("table_name", "string"),
}
WIPE_PRESERVED_CATALOG_JOB = {1: Field("db_name", "string")}

OPERATION_METADATA = {
    1: Field("cpu_nanos", "uint64"),
    2: Field("wall_nanos", "uint64"),
    3: Field("task_count", "uint64"),
    4: Field("pending_count", "uint64"),
    # oneof job
    5: Field("dummy", "message", DUMMY_JOB),
    7: Field("close_chunk", "message", _CHUNK_JOB),
    8: Field("write_chunk", "message", _CHUNK_JOB),
    9: Field("wipe_preserved_catalog", "message", WIPE_PRESERVED_CATALOG_JOB),
    10: Field("compact_chunks", "message", _CHUNKS_JOB),
    11: Field("persist_chunks", "message", _CHUNKS_JOB),
}

#: store.record_operation job string -> OPERATION_METADATA oneof field
JOB_FIELD_BY_NAME = {
    "Dummy": "dummy",
    "CloseChunk": "close_chunk",
    "WriteChunk": "write_chunk",
    "WipePreservedCatalog": "wipe_preserved_catalog",
    "CompactChunks": "compact_chunks",
    "PersistChunks": "persist_chunks",
}

# -- database_rules.proto ---------------------------------------------------

COLUMN_FORMAT = {1: Field("column", "string"), 2: Field("format", "string")}
TEMPLATE_PART = {
    # oneof part
    1: Field("table", "message", EMPTY),
    2: Field("column", "string"),
    3: Field("time", "string"),
    4: Field("regex", "message", COLUMN_FORMAT),
    5: Field("strf_time", "message", COLUMN_FORMAT),
}
PARTITION_TEMPLATE = {1: Field("parts", "message", TEMPLATE_PART, repeated=True)}

LIFECYCLE_RULES = {
    1: Field("mutable_linger_seconds", "uint32"),
    4: Field("buffer_size_soft", "uint64"),
    5: Field("buffer_size_hard", "uint64"),
    7: Field("drop_non_persisted", "bool"),
    8: Field("immutable", "bool"),
    9: Field("persist", "bool"),
    10: Field("worker_backoff_millis", "uint64"),
    11: Field("catalog_transactions_until_checkpoint", "uint64"),
    12: Field("late_arrive_window_seconds", "uint32"),
    13: Field("persist_row_threshold", "uint64"),
    14: Field("persist_age_threshold_seconds", "uint32"),
}

# -- shard.proto ------------------------------------------------------------

MATCHER = {1: Field("table_name_regex", "string"), 2: Field("predicate", "string")}
MATCHER_TO_SHARD = {
    1: Field("matcher", "message", MATCHER),
    2: Field("shard", "uint32"),
}
HASH_RING = {
    1: Field("table_name", "bool"),
    2: Field("columns", "string", repeated=True),
    3: Field("shards", "uint32", repeated=True),
}
NODE = {1: Field("id", "uint32")}
NODE_GROUP = {1: Field("nodes", "message", NODE, repeated=True)}
SHARD = {1: Field("iox", "message", NODE_GROUP)}  # oneof sink
# proto map<uint32, Shard> = repeated {key=1, value=2} entries
SHARD_MAP_ENTRY = {1: Field("key", "uint32"), 2: Field("value", "message", SHARD)}
SHARD_CONFIG = {
    1: Field("specific_targets", "message", MATCHER_TO_SHARD, repeated=True),
    2: Field("hash_ring", "message", HASH_RING),
    3: Field("ignore_errors", "bool"),
    4: Field("shards", "message", SHARD_MAP_ENTRY, repeated=True),
}
ROUTING_CONFIG = {1: Field("target", "message", NODE_GROUP)}

DATABASE_RULES = {
    1: Field("name", "string"),
    2: Field("partition_template", "message", PARTITION_TEMPLATE),
    3: Field("lifecycle_rules", "message", LIFECYCLE_RULES),
    # routing_rules oneof
    8: Field("shard_config", "message", SHARD_CONFIG),
    9: Field("routing_config", "message", ROUTING_CONFIG),
    10: Field("worker_cleanup_avg_sleep", "message", DURATION),
    # write_buffer_connection oneof
    11: Field("writing", "string"),
    12: Field("reading", "string"),
}

# -- chunk.proto / partition.proto ------------------------------------------

# ChunkStorage enum
(
    CHUNK_STORAGE_UNSPECIFIED,
    CHUNK_STORAGE_OPEN_MUTABLE_BUFFER,
    CHUNK_STORAGE_CLOSED_MUTABLE_BUFFER,
    CHUNK_STORAGE_READ_BUFFER,
    CHUNK_STORAGE_READ_BUFFER_AND_OBJECT_STORE,
    CHUNK_STORAGE_OBJECT_STORE_ONLY,
) = range(6)

# ChunkLifecycleAction enum
(
    CHUNK_LIFECYCLE_ACTION_UNSPECIFIED,
    CHUNK_LIFECYCLE_ACTION_MOVING,
    CHUNK_LIFECYCLE_ACTION_PERSISTING,
    CHUNK_LIFECYCLE_ACTION_COMPACTING,
) = range(4)

CHUNK = {
    1: Field("partition_key", "string"),
    2: Field("id", "uint32"),
    3: Field("storage", "enum"),
    4: Field("estimated_bytes", "uint64"),
    5: Field("time_of_first_write", "message", TIMESTAMP),
    6: Field("time_of_last_write", "message", TIMESTAMP),
    7: Field("time_closed", "message", TIMESTAMP),
    8: Field("table_name", "string"),
    9: Field("row_count", "uint64"),
    10: Field("lifecycle_action", "enum"),
}

PARTITION = {1: Field("key", "string")}

# -- management service messages --------------------------------------------

GET_SERVER_ID_REQUEST: dict[int, Field] = {}
GET_SERVER_ID_RESPONSE = {1: Field("id", "uint32")}
UPDATE_SERVER_ID_REQUEST = {1: Field("id", "uint32")}
UPDATE_SERVER_ID_RESPONSE: dict[int, Field] = {}

SET_SERVING_READINESS_REQUEST = {1: Field("ready", "bool")}
SET_SERVING_READINESS_RESPONSE: dict[int, Field] = {}

LIST_DATABASES_REQUEST: dict[int, Field] = {}
LIST_DATABASES_RESPONSE = {1: Field("names", "string", repeated=True)}

GET_DATABASE_REQUEST = {1: Field("name", "string")}
GET_DATABASE_RESPONSE = {1: Field("rules", "message", DATABASE_RULES)}
CREATE_DATABASE_REQUEST = {1: Field("rules", "message", DATABASE_RULES)}
CREATE_DATABASE_RESPONSE: dict[int, Field] = {}
UPDATE_DATABASE_REQUEST = {1: Field("rules", "message", DATABASE_RULES)}
UPDATE_DATABASE_RESPONSE = {1: Field("rules", "message", DATABASE_RULES)}

LIST_CHUNKS_REQUEST = {1: Field("db_name", "string")}
LIST_CHUNKS_RESPONSE = {1: Field("chunks", "message", CHUNK, repeated=True)}

CREATE_DUMMY_JOB_REQUEST = {1: Field("nanos", "uint64", repeated=True)}
CREATE_DUMMY_JOB_RESPONSE = {1: Field("operation", "message", OPERATION)}

REMOTE = {1: Field("id", "uint32"), 2: Field("connection_string", "string")}
LIST_REMOTES_REQUEST: dict[int, Field] = {}
LIST_REMOTES_RESPONSE = {1: Field("remotes", "message", REMOTE, repeated=True)}
UPDATE_REMOTE_REQUEST = {1: Field("remote", "message", REMOTE)}
UPDATE_REMOTE_RESPONSE: dict[int, Field] = {}
DELETE_REMOTE_REQUEST = {1: Field("id", "uint32")}
DELETE_REMOTE_RESPONSE: dict[int, Field] = {}

LIST_PARTITIONS_REQUEST = {1: Field("db_name", "string")}
LIST_PARTITIONS_RESPONSE = {
    1: Field("partitions", "message", PARTITION, repeated=True)
}
GET_PARTITION_REQUEST = {
    1: Field("db_name", "string"),
    2: Field("partition_key", "string"),
}
GET_PARTITION_RESPONSE = {1: Field("partition", "message", PARTITION)}
LIST_PARTITION_CHUNKS_REQUEST = {
    1: Field("db_name", "string"),
    2: Field("partition_key", "string"),
}
LIST_PARTITION_CHUNKS_RESPONSE = {
    1: Field("chunks", "message", CHUNK, repeated=True)
}

NEW_PARTITION_CHUNK_REQUEST = {
    1: Field("db_name", "string"),
    2: Field("partition_key", "string"),
    3: Field("table_name", "string"),
}
NEW_PARTITION_CHUNK_RESPONSE: dict[int, Field] = {}

CLOSE_PARTITION_CHUNK_REQUEST = {
    1: Field("db_name", "string"),
    2: Field("partition_key", "string"),
    3: Field("chunk_id", "uint32"),
    4: Field("table_name", "string"),
}
CLOSE_PARTITION_CHUNK_RESPONSE = {1: Field("operation", "message", OPERATION)}

UNLOAD_PARTITION_CHUNK_REQUEST = {
    1: Field("db_name", "string"),
    2: Field("partition_key", "string"),
    3: Field("chunk_id", "uint32"),
    4: Field("table_name", "string"),
}
UNLOAD_PARTITION_CHUNK_RESPONSE: dict[int, Field] = {}

MGMT_ERROR = {1: Field("message", "string")}

# DatabaseStatus.DatabaseState enum
(
    DATABASE_STATE_UNSPECIFIED,
    DATABASE_STATE_KNOWN,
    DATABASE_STATE_RULES_LOADED,
    DATABASE_STATE_REPLAY,
    DATABASE_STATE_INITIALIZED,
) = range(5)

DATABASE_STATUS = {
    1: Field("db_name", "string"),
    2: Field("error", "message", MGMT_ERROR),
    3: Field("state", "enum"),
}
SERVER_STATUS = {
    1: Field("initialized", "bool"),
    2: Field("error", "message", MGMT_ERROR),
    3: Field("database_statuses", "message", DATABASE_STATUS, repeated=True),
}
GET_SERVER_STATUS_REQUEST: dict[int, Field] = {}
GET_SERVER_STATUS_RESPONSE = {1: Field("server_status", "message", SERVER_STATUS)}

WIPE_PRESERVED_CATALOG_REQUEST = {1: Field("db_name", "string")}
WIPE_PRESERVED_CATALOG_RESPONSE = {1: Field("operation", "message", OPERATION)}

# -- write service messages -------------------------------------------------

WRITE_REQUEST = {1: Field("db_name", "string"), 2: Field("lp_data", "string")}
WRITE_RESPONSE = {1: Field("lines_written", "uint64")}
WRITE_ENTRY_REQUEST = {1: Field("db_name", "string"), 2: Field("entry", "bytes")}
WRITE_ENTRY_RESPONSE: dict[int, Field] = {}

# -- google.longrunning operations service ----------------------------------

LIST_OPERATIONS_REQUEST = {
    # name=4, filter=1, page_size=2, page_token=3 per operations.proto
    1: Field("filter", "string"),
    2: Field("page_size", "int32"),
    3: Field("page_token", "string"),
    4: Field("name", "string"),
}
LIST_OPERATIONS_RESPONSE = {
    1: Field("operations", "message", OPERATION, repeated=True),
    2: Field("next_page_token", "string"),
}
GET_OPERATION_REQUEST = {1: Field("name", "string")}
CANCEL_OPERATION_REQUEST = {1: Field("name", "string")}
DELETE_OPERATION_REQUEST = {1: Field("name", "string")}
WAIT_OPERATION_REQUEST = {
    1: Field("name", "string"),
    2: Field("timeout", "message", DURATION),
}

#: method name -> (request schema, response schema); streaming=false for all
MANAGEMENT_METHODS = {
    "GetServerId": (GET_SERVER_ID_REQUEST, GET_SERVER_ID_RESPONSE),
    "UpdateServerId": (UPDATE_SERVER_ID_REQUEST, UPDATE_SERVER_ID_RESPONSE),
    "SetServingReadiness": (
        SET_SERVING_READINESS_REQUEST,
        SET_SERVING_READINESS_RESPONSE,
    ),
    "ListDatabases": (LIST_DATABASES_REQUEST, LIST_DATABASES_RESPONSE),
    "GetDatabase": (GET_DATABASE_REQUEST, GET_DATABASE_RESPONSE),
    "CreateDatabase": (CREATE_DATABASE_REQUEST, CREATE_DATABASE_RESPONSE),
    "UpdateDatabase": (UPDATE_DATABASE_REQUEST, UPDATE_DATABASE_RESPONSE),
    "ListChunks": (LIST_CHUNKS_REQUEST, LIST_CHUNKS_RESPONSE),
    "CreateDummyJob": (CREATE_DUMMY_JOB_REQUEST, CREATE_DUMMY_JOB_RESPONSE),
    "ListRemotes": (LIST_REMOTES_REQUEST, LIST_REMOTES_RESPONSE),
    "UpdateRemote": (UPDATE_REMOTE_REQUEST, UPDATE_REMOTE_RESPONSE),
    "DeleteRemote": (DELETE_REMOTE_REQUEST, DELETE_REMOTE_RESPONSE),
    "ListPartitions": (LIST_PARTITIONS_REQUEST, LIST_PARTITIONS_RESPONSE),
    "GetPartition": (GET_PARTITION_REQUEST, GET_PARTITION_RESPONSE),
    "ListPartitionChunks": (
        LIST_PARTITION_CHUNKS_REQUEST,
        LIST_PARTITION_CHUNKS_RESPONSE,
    ),
    "NewPartitionChunk": (
        NEW_PARTITION_CHUNK_REQUEST,
        NEW_PARTITION_CHUNK_RESPONSE,
    ),
    "ClosePartitionChunk": (
        CLOSE_PARTITION_CHUNK_REQUEST,
        CLOSE_PARTITION_CHUNK_RESPONSE,
    ),
    "UnloadPartitionChunk": (
        UNLOAD_PARTITION_CHUNK_REQUEST,
        UNLOAD_PARTITION_CHUNK_RESPONSE,
    ),
    "GetServerStatus": (GET_SERVER_STATUS_REQUEST, GET_SERVER_STATUS_RESPONSE),
    "WipePreservedCatalog": (
        WIPE_PRESERVED_CATALOG_REQUEST,
        WIPE_PRESERVED_CATALOG_RESPONSE,
    ),
}

WRITE_METHODS = {
    "Write": (WRITE_REQUEST, WRITE_RESPONSE),
    "WriteEntry": (WRITE_ENTRY_REQUEST, WRITE_ENTRY_RESPONSE),
}

OPERATIONS_METHODS = {
    "ListOperations": (LIST_OPERATIONS_REQUEST, LIST_OPERATIONS_RESPONSE),
    "GetOperation": (GET_OPERATION_REQUEST, OPERATION),
    "CancelOperation": (CANCEL_OPERATION_REQUEST, EMPTY),
    "DeleteOperation": (DELETE_OPERATION_REQUEST, EMPTY),
    "WaitOperation": (WAIT_OPERATION_REQUEST, OPERATION),
}


# -- influxdata/transfer/column/v1/write.proto (PB columnar write) ----------
# Reference: generated_types/protos/influxdata/transfer/column/v1/write.proto
# served by src/influxdb_ioxd/rpc/write_pb.rs (PBWriteService).

PB_VALUES = {
    1: Field("i64_values", "int64", repeated=True),
    2: Field("f64_values", "double", repeated=True),
    3: Field("u64_values", "uint64", repeated=True),
    4: Field("string_values", "string", repeated=True),
    5: Field("bool_values", "bool", repeated=True),
    6: Field("bytes_values", "bytes", repeated=True),
}
PB_COLUMN = {
    1: Field("column_name", "string"),
    2: Field("semantic_type", "enum"),
    3: Field("values", "message", PB_VALUES),
    4: Field("null_mask", "bytes"),
}
PB_TABLE_BATCH = {
    1: Field("table_name", "string"),
    2: Field("columns", "message", PB_COLUMN, repeated=True),
    3: Field("row_count", "uint32"),
}
PB_DATABASE_BATCH = {
    1: Field("database_name", "string"),
    2: Field("table_batches", "message", PB_TABLE_BATCH, repeated=True),
}
PB_WRITE_REQUEST = {1: Field("database_batch", "message", PB_DATABASE_BATCH)}
PB_WRITE_RESPONSE: dict[int, Field] = {}

PB_WRITE_METHODS = {"Write": (PB_WRITE_REQUEST, PB_WRITE_RESPONSE)}

# -- iox_testing (test/v1 TestErrorRequest/Response) ------------------------
TEST_ERROR_REQUEST: dict[int, Field] = {}
TEST_ERROR_RESPONSE: dict[int, Field] = {}
TESTING_METHODS = {"TestError": (TEST_ERROR_REQUEST, TEST_ERROR_RESPONSE)}
