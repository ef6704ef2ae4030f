"""S3 REST client specifics beyond the shared contract battery
(test_objstore_manifest runs that battery over this client): ListV2
continuation-token paging, SigV4 determinism, error mapping."""

from __future__ import annotations

import datetime as dt

import pytest

from influxdb_iox_spark.sources.s3rest import (
    S3RequestError,
    S3RestObjectStore,
    SigV4Signer,
)
from tests.s3_stub import PAGE, S3Stub


@pytest.fixture(scope="module")
def stub():
    s = S3Stub()
    yield s
    s.stop()


def _client(stub, prefix="p/"):
    return S3RestObjectStore(stub.endpoint, stub.bucket, prefix=prefix)


def test_listing_pages_through_continuation_tokens(stub):
    """More keys than the stub's page size: the client must follow
    NextContinuationToken to completion — a truncated LIST would
    silently shrink the manifest."""
    c = _client(stub, prefix="page/")
    n = PAGE * 2 + 17
    for i in range(n):
        c.put(f"k{i:05d}", b"x")
    keys = c.list("k")
    assert len(keys) == n
    assert keys == sorted(keys)
    pairs = c.list_with_etags("k")
    assert len(pairs) == n
    assert all(etag for _, etag in pairs)


def test_prefix_isolation_and_head(stub):
    a, b = _client(stub, "ia/"), _client(stub, "ib/")
    a.put("k", b"alpha")
    assert b.get("k") is None
    assert b.list("") == []
    assert a.head("k") == a.get("k")[1]
    assert a.head("missing") is None


def test_conditional_put_over_http(stub):
    c = _client(stub, "cond/")
    e1 = c.put("k", b"a", if_not_exists=True)
    assert e1 is not None
    assert c.put("k", b"b", if_not_exists=True) is None  # 412 -> CAS lost
    assert c.put("k", b"c", if_match="bogus") is None
    e2 = c.put("k", b"c", if_match=e1)
    assert e2 is not None and e2 != e1
    c.delete("k")
    c.delete("k")  # idempotent
    assert c.get("k") is None


def test_server_error_raises_loudly(stub):
    c = S3RestObjectStore(stub.endpoint, "wrong-bucket")
    with pytest.raises(S3RequestError):
        c.put("k", b"x")


def test_sigv4_signature_is_deterministic_and_keyed():
    """Same inputs → same Authorization; different secret → different
    signature (structure pinned; full vector conformance is only
    provable against a real S3 endpoint, which the sandbox lacks)."""
    now = dt.datetime(2015, 8, 30, 12, 36, tzinfo=dt.timezone.utc)
    s1 = SigV4Signer("AKIDEXAMPLE", "secret1", "us-east-1")
    s2 = SigV4Signer("AKIDEXAMPLE", "secret2", "us-east-1")
    url = "http://example.amazonaws.com/bucket/key?list-type=2&prefix=a%2Fb"
    h1 = s1.sign("GET", url, {}, "UNSIGNED", now=now)
    h1b = s1.sign("GET", url, {}, "UNSIGNED", now=now)
    h2 = s2.sign("GET", url, {}, "UNSIGNED", now=now)
    assert h1["Authorization"] == h1b["Authorization"]
    assert h1["Authorization"] != h2["Authorization"]
    assert h1["x-amz-date"] == "20150830T123600Z"
    assert "Credential=AKIDEXAMPLE/20150830/us-east-1/s3/aws4_request" in h1["Authorization"]
    assert "SignedHeaders=host;x-amz-content-sha256;x-amz-date" in h1["Authorization"]
    sig = h1["Authorization"].rsplit("Signature=", 1)[1]
    assert len(sig) == 64 and int(sig, 16) >= 0
