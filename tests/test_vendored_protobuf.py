"""Tests for the vendored minimal protobuf runtime
(etl_weather_spark/_vendor/google/protobuf).

Three layers: raw wire-format primitives against hand-computed bytes
from the public encoding spec, presence/auto-vivification semantics,
and integration with PySpark's real generated StateMessage_pb2 module
(the actual consumer that motivated the vendoring).
"""

from __future__ import annotations

import pytest

from etl_weather_spark._vendor import ensure_protobuf

ensure_protobuf()

from google.protobuf._minimal import (  # noqa: E402
    decode_varint,
    encode_varint,
    parse_file_descriptor,
    resolve_types,
)


def test_varint_spec_examples():
    # canonical examples from the protobuf encoding guide
    assert encode_varint(1) == b"\x01"
    assert encode_varint(150) == b"\x96\x01"
    assert encode_varint(300) == b"\xac\x02"
    # negative int64: 10-byte two's complement
    assert encode_varint(-1) == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -5):
        enc = encode_varint(v)
        dec, pos = decode_varint(enc, 0)
        assert pos == len(enc)
        if v < 0:
            assert dec == v + (1 << 64)
        else:
            assert dec == v


def _pyspark_pb2():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_statemessage_descriptor_parses():
    sm = _pyspark_pb2()
    fd = sm.DESCRIPTOR
    assert "StateRequest" in fd.message_types_by_name
    req = fd.message_types_by_name["StateRequest"]
    assert req.fields_by_name["version"].number == 1
    assert [o.name for o in req.oneofs] == ["method"]
    hs = fd.enum_types_by_name["HandleState"]
    assert hs.values_by_name["PRE_INIT"] == 0
    assert hs.values_by_name["CLOSED"] == 5
    assert sm.PRE_INIT == 0 and sm.DATA_PROCESSED == 3


def test_known_wire_bytes_roundtrip():
    sm = _pyspark_pb2()
    # StateRequest{version=2} = field 1 varint 2 -> 08 02
    assert sm.StateRequest(version=2).SerializeToString() == b"\x08\x02"
    # SetImplicitKey{key=b"ab"} = field 1 LEN 2 'ab' -> 0A 02 61 62
    assert sm.SetImplicitKey(key=b"ab").SerializeToString() == b"\x0a\x02ab"
    # RegisterTimer{expiryTimestampMs=1000} -> field 1 varint 1000
    assert (
        sm.RegisterTimer(expiryTimestampMs=1000).SerializeToString()
        == b"\x08" + b"\xe8\x07"
    )
    # proto3 default scalars are omitted
    assert sm.StateRequest(version=0).SerializeToString() == b""
    assert sm.StateResponse(statusCode=0, errorMessage="").SerializeToString() == b""


def test_nested_autovivify_presence():
    sm = _pyspark_pb2()
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    # bare READ of a message field must not create presence
    _ = cmd.ttl.durationMs
    assert not cmd.HasField("ttl")
    assert cmd.SerializeToString() == b"\x0a\x01s"
    # WRITE through the auto-vivified child must mark presence upward
    cmd.ttl.durationMs = 7
    assert cmd.HasField("ttl")
    parsed = sm.StateCallCommand()
    parsed.ParseFromString(cmd.SerializeToString())
    assert parsed.ttl.durationMs == 7


def test_oneof_empty_message_keeps_presence():
    sm = _pyspark_pb2()
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    data = req.SerializeToString()
    assert data  # empty sub-message still emits its length-delimited tag
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.HasField("implicitGroupingKeyRequest")
    assert back.implicitGroupingKeyRequest.HasField("removeImplicitKey")
    assert back.WhichOneof("method") == "implicitGroupingKeyRequest"


def test_repeated_fields_roundtrip():
    sm = _pyspark_pb2()
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"x", b"yz"], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert list(back.value) == [b"x", b"yz"]
    assert back.requireNextFetch is True
    kv = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ]
    )
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(kv.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_unknown_fields_skipped():
    sm = _pyspark_pb2()
    # field 15 varint (unknown to StateResponse) + statusCode=3
    data = b"\x78\x05" + b"\x08\x03"
    msg = sm.StateResponse()
    msg.ParseFromString(data)
    assert msg.statusCode == 3


def test_negative_int64_roundtrip():
    sm = _pyspark_pb2()
    t = sm.TimerInfo(timestampMs=-42)
    back = sm.TimerInfo()
    back.ParseFromString(t.SerializeToString())
    assert back.timestampMs == -42


def test_out_of_scope_field_type_raises():
    # a FileDescriptorProto declaring a double field (type 1) must be
    # rejected loudly at build time, not silently mis-serialized.
    # FileDescriptorProto: name=1 "t.proto", message_type=4 {name=1 "M",
    # field=2 {name=1 "d", number=3 varint 1, type=5 varint 1}}
    fld = b"\x0a\x01d" + b"\x18\x01" + b"\x28\x01"
    msg = b"\x0a\x01M" + b"\x12" + bytes([len(fld)]) + fld
    fdp = b"\x0a\x07t.proto" + b"\x22" + bytes([len(msg)]) + msg
    with pytest.raises(NotImplementedError, match="scope"):
        resolve_types(parse_file_descriptor(fdp))


def _build_nested_repeated_classes():
    """message C { repeated int64 xs = 1; }  message M { C child = 1; }
    hand-encoded as FileDescriptorProto bytes (public descriptor.proto)."""
    from google.protobuf._minimal import make_message_class

    fld_xs = b"\x0a\x02xs" + b"\x18\x01" + b"\x20\x03" + b"\x28\x03"
    msg_c = b"\x0a\x01C" + b"\x12" + bytes([len(fld_xs)]) + fld_xs
    fld_child = (
        b"\x0a\x05child" + b"\x18\x01" + b"\x20\x01" + b"\x28\x0b" + b"\x32\x02.C"
    )
    msg_m = b"\x0a\x01M" + b"\x12" + bytes([len(fld_child)]) + fld_child
    fdp = (
        b"\x0a\x07t.proto"
        + b"\x22" + bytes([len(msg_c)]) + msg_c
        + b"\x22" + bytes([len(msg_m)]) + msg_m
    )
    fd = parse_file_descriptor(fdp)
    resolve_types(fd)
    c_cls = make_message_class(fd.message_types_by_name["C"])
    m_cls = make_message_class(fd.message_types_by_name["M"])
    return c_cls, m_cls


def test_autovivified_repeated_mutation_propagates_presence():
    """parent.child.xs.append(v) on an auto-vivified child must mark the
    child present (ADVICE r5: the list used to land in a dropped child);
    a bare READ of the repeated field still creates no presence."""
    _, m_cls = _build_nested_repeated_classes()
    m = m_cls()
    _ = list(m.child.xs)  # read-only: no presence anywhere
    assert not m.HasField("child")
    assert m.SerializeToString() == b""
    m.child.xs.append(7)
    assert m.HasField("child")
    back = m_cls()
    back.ParseFromString(m.SerializeToString())
    assert list(back.child.xs) == [7]
    # extend / setitem mutate through the same path
    m2 = m_cls()
    m2.child.xs.extend([1, 2])
    assert m2.HasField("child")
    back2 = m_cls()
    back2.ParseFromString(m2.SerializeToString())
    assert list(back2.child.xs) == [1, 2]


def test_packed_repeated_varint_parse():
    """proto3 serializers pack repeated scalars into one LEN field; the
    runtime must decode that wire form (ADVICE r5), including negatives
    and mixes of packed + unpacked records."""
    c_cls, _ = _build_nested_repeated_classes()
    # xs = [3, 270, -1] packed: field 1 LEN, payload = varints
    payload = (
        encode_varint(3) + encode_varint(270) + encode_varint(-1)
    )
    data = b"\x0a" + encode_varint(len(payload)) + payload
    msg = c_cls()
    msg.ParseFromString(data)
    assert list(msg.xs) == [3, 270, -1]
    # unpacked record appended after a packed run merges in order
    msg2 = c_cls()
    msg2.ParseFromString(data + b"\x08" + encode_varint(9))
    assert list(msg2.xs) == [3, 270, -1, 9]


def test_oneof_set_clears_siblings():
    """Setting a second member of a oneof on a reused message must clear
    the first, so serialization emits one member and WhichOneof reports
    the last-set field (ADVICE r5)."""
    sm = _pyspark_pb2()
    req = sm.StateRequest()
    req.statefulProcessorCall.CopyFrom(sm.StatefulProcessorCall())
    assert req.WhichOneof("method") == "statefulProcessorCall"
    req.implicitGroupingKeyRequest.CopyFrom(sm.ImplicitGroupingKeyRequest())
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert not req.HasField("statefulProcessorCall")
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert not back.HasField("statefulProcessorCall")


def test_repeated_read_aliases_are_stable():
    """Two pre-mutation reads of a repeated field must alias ONE list
    (real-protobuf semantics): appends through either reference land in
    the same container, and serialization sees both."""
    c_cls, m_cls = _build_nested_repeated_classes()
    msg = c_cls()
    a = msg.xs
    b = msg.xs
    a.append(1)
    b.append(2)
    assert list(msg.xs) == [1, 2]
    back = c_cls()
    back.ParseFromString(msg.SerializeToString())
    assert list(back.xs) == [1, 2]
    # nested: aliased reads through an auto-vivified child
    m = m_cls()
    x1 = m.child.xs  # NOTE: each `.child` read vivifies a fresh child
    x1.append(7)
    assert m.HasField("child") and list(m.child.xs) == [7]
    m.child.xs.append(8)
    assert list(m.child.xs) == [7, 8]
