"""Wire-format tests for the vendored minimal protobuf runtime
(smartpipeline_spark/vendor/google/protobuf) — the shim that lets the
Spark-4 transformWithStateInPandas state protocol run where protobuf
is not installed. The end-to-end attestation is
test_streaming.test_transform_with_state_matches_batch_counts (a real
JVM round-trip through the RocksDB state server); these tests pin the
codec primitives the JVM validates implicitly there.
"""

import os
import sys

VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "smartpipeline_spark",
    "vendor",
)


def _pb2():
    from smartpipeline_spark.session import ensure_protobuf

    assert ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_pb2_builds_and_exposes_enums():
    sm = _pb2()
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    for name in (
        "StateRequest",
        "StateResponse",
        "StateCallCommand",
        "ValueStateCall",
        "ListStateCall",
        "MapStateCall",
        "KeyAndValuePair",
        "TimerInfo",
    ):
        assert hasattr(sm, name), name


def test_request_wire_bytes_are_canonical_proto3():
    """Hand-computed wire bytes for the exact message shape the
    pyspark client sends on getValueState: field numbers and nesting
    from the public StateMessage.proto schema."""
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.stateName = "n"
    call = sm.StatefulProcessorCall(getValueState=cmd)
    req = sm.StateRequest(statefulProcessorCall=call)
    # StateRequest.statefulProcessorCall = field 2 (LEN)
    #   StatefulProcessorCall.getValueState = field 2 (LEN)
    #     StateCallCommand.stateName = field 1 (LEN) "n"
    assert req.SerializeToString() == bytes.fromhex("120512030a016e")
    # proto3: unset scalar fields are absent from the wire
    assert sm.StateRequest().SerializeToString() == b""
    assert sm.StateRequest(version=0).SerializeToString() == b""
    assert sm.StateRequest(version=1).SerializeToString() == bytes.fromhex("0801")


def test_negative_int64_roundtrip():
    sm = _pb2()
    m = sm.RegisterTimer(expiryTimestampMs=-1)
    data = m.SerializeToString()
    # -1 as 10-byte two's-complement varint on field 1
    assert data == bytes.fromhex("08ffffffffffffffffff01")
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1
    big = sm.RegisterTimer(expiryTimestampMs=(1 << 62))
    back2 = sm.RegisterTimer()
    back2.ParseFromString(big.SerializeToString())
    assert back2.expiryTimestampMs == 1 << 62


def test_repeated_bytes_preserves_empty_elements_and_order():
    sm = _pb2()
    m = sm.StateResponseWithListGet()
    m.ParseFromString(
        # statusCode=0 absent; value=[b'ab', b'', b'c']; requireNextFetch=true
        bytes.fromhex("1a026162" + "1a00" + "1a0163" + "2001")
    )
    assert list(m.value) == [b"ab", b"", b"c"]
    assert m.requireNextFetch is True
    assert m.statusCode == 0 and m.errorMessage == ""


def test_nested_repeated_message_parse():
    sm = _pb2()
    kv = sm.KeyAndValuePair(key=b"k1", value=b"v1")
    kv2 = sm.KeyAndValuePair(key=b"k2")
    resp = sm.StateResponseWithMapIterator()
    payload = bytearray()
    for item in (kv, kv2):
        inner = item.SerializeToString()
        payload += bytes([0x1A, len(inner)]) + inner  # field 3 LEN
    resp.ParseFromString(bytes(payload))
    assert [(p.key, p.value) for p in resp.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b""),
    ]


def test_unknown_fields_are_skipped():
    sm = _pb2()
    resp = sm.StateResponse()
    # field 99 varint, field 98 LEN, then errorMessage="x"
    resp.ParseFromString(
        bytes.fromhex("98067b" + "920403616263" + "120178")
    )
    assert resp.errorMessage == "x"


def test_submessage_autovivify_marks_presence():
    """Scoped deviation from full protobuf semantics, relied on by the
    pyspark client (`cmd.ttl.durationMs = 5`): touching a submessage
    attribute creates and ATTACHES it."""
    sm = _pb2()
    cmd = sm.StateCallCommand()
    cmd.ttl.durationMs = 5
    data = cmd.SerializeToString()
    back = sm.StateCallCommand()
    back.ParseFromString(data)
    assert back.HasField("ttl") and back.ttl.durationMs == 5


def _is_shim(pb_dir: str) -> bool:
    from smartpipeline_spark.session import SHIM_MARKER

    return VENDOR in pb_dir or os.path.exists(os.path.join(pb_dir, SHIM_MARKER))


def test_real_protobuf_wins_when_installed():
    """ensure_protobuf must not shadow a genuine installation: the
    shim (vendor dir or a marker-bearing provisioned copy) is only
    active when no real protobuf exists anywhere on the path."""
    import importlib.util

    from smartpipeline_spark.session import ensure_protobuf

    ensure_protobuf()
    spec = importlib.util.find_spec("google.protobuf")
    assert spec is not None
    origin = spec.origin or ""
    if _is_shim(os.path.dirname(origin)):
        # shim active => no real installation anywhere on the path
        for p in sys.path:
            cand = os.path.join(p, "google", "protobuf")
            if os.path.exists(os.path.join(cand, "__init__.py")) and not _is_shim(
                cand
            ):
                raise AssertionError(f"shim shadows a real protobuf at {cand}")


def test_provisioned_shim_reaches_a_fresh_interpreter():
    """The round-8 driver crash: a JVM the engine did not launch
    forks Python workers that must still import google.protobuf.
    Package import provisions the shim into site-packages as a
    namespace portion, so a FRESH interpreter with no sys.path edits
    and no $PYTHONPATH sees it."""
    import importlib.util
    import subprocess

    import smartpipeline_spark  # noqa: F401  (import-time provisioning)

    spec = importlib.util.find_spec("google.protobuf")
    assert spec is not None
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", "import google.protobuf; print('ok')"],
        capture_output=True,
        text=True,
        env=env,
    )
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr


def test_vendor_google_is_a_namespace_portion():
    """vendor/google must NOT be a regular package: a regular package
    on sys.path would claim the whole 'google' name and hide other
    namespace portions (google.auth, google.cloud, a real
    google.protobuf earlier on the path)."""
    assert not os.path.exists(os.path.join(VENDOR, "google", "__init__.py"))


def test_provision_unprovision_roundtrip():
    """unprovision_protobuf removes exactly the marker-owned copies
    and provision_protobuf can re-install afterwards — run in a fresh
    subprocess (no $PYTHONPATH, clean import caches) that RESTORES the
    provisioned state before exiting, so the rest of the suite keeps
    its launch-order-proof shim."""
    import subprocess

    script = """
import os, importlib.util
from smartpipeline_spark import session as S

removed = S.unprovision_protobuf()
assert all(os.path.basename(p) == "protobuf" for p in removed), removed
assert S.unprovision_protobuf() == [], "second unprovision must be a no-op"
for sp in S._site_candidates():
    assert not os.path.exists(os.path.join(sp, "google", "protobuf", S.SHIM_MARKER))
importlib.invalidate_caches()
sp = S.provision_protobuf()
if removed:
    assert sp is not None, "re-provision failed after unprovision"
    assert os.path.exists(os.path.join(sp, "google", "protobuf", S.SHIM_MARKER))
assert importlib.util.find_spec("google.protobuf") is not None
print("ROUNDTRIP-OK")
"""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, env=env
    )
    assert out.returncode == 0 and "ROUNDTRIP-OK" in out.stdout, out.stderr
    # the subprocess mutated site-packages under THIS process's feet;
    # refresh our finders and prove the runtime is still reachable so
    # a breakage fails HERE, not as a silent skip in a later TWS test
    import importlib

    importlib.invalidate_caches()
    from smartpipeline_spark.session import ensure_protobuf

    assert ensure_protobuf(), "protobuf unreachable after roundtrip"


def test_no_provision_env_leaves_site_packages_untouched():
    """With $SMARTPIPELINE_SPARK_NO_PROVISION=1 the package import must
    not write to site-packages, while ensure_protobuf()'s PYTHONPATH
    fallback still makes google.protobuf importable for engine-owned
    sessions. Runs in a subprocess that first unprovisions (so the
    opt-out has something to decline), then restores the provisioned
    state before exiting."""
    import subprocess

    script = """
import os, importlib, importlib.util
from smartpipeline_spark import session as S

had_shim = bool(S.unprovision_protobuf())
importlib.invalidate_caches()
os.environ[S.NO_PROVISION_ENV] = "1"
assert S.provision_protobuf() is None, "opt-out must block the site write"
for sp in S._site_candidates():
    assert not os.path.exists(os.path.join(sp, "google", "protobuf", S.SHIM_MARKER)), sp
assert S.ensure_protobuf(), "PYTHONPATH fallback must still work"
assert importlib.util.find_spec("google.protobuf") is not None
vendor = os.path.join(os.path.dirname(os.path.abspath(S.__file__)), "vendor")
assert vendor in os.environ.get("PYTHONPATH", "").split(os.pathsep)
# restore: drop the opt-out and re-provision for the rest of the suite.
# The fallback put vendor on sys.path, which makes google.protobuf
# importable and would make provision_protobuf() decline — remove it
# first so the site-packages copy really comes back.
del os.environ[S.NO_PROVISION_ENV]
import sys
if vendor in sys.path:
    sys.path.remove(vendor)
for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
    del sys.modules[mod]
importlib.invalidate_caches()
if had_shim:
    restored = S.provision_protobuf()
    assert restored is not None, "restore re-provision failed"
print("OPTOUT-OK")
"""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, env=env
    )
    assert out.returncode == 0 and "OPTOUT-OK" in out.stdout, out.stderr
    import importlib

    importlib.invalidate_caches()
    from smartpipeline_spark.session import ensure_protobuf

    assert ensure_protobuf(), "protobuf unreachable after opt-out test"
