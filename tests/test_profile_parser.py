"""profile_step.py xplane parsing: scope attribution over a synthetic trace.

The real capture needs TPU hardware; this pins the parser's mechanics — op
aggregation, named_scope bucketing (models/tggcn.py labels), forward/backward
split — against a hand-built XSpace proto with the device-plane layout the
TPU runtime emits ('XLA Ops' line, tf_op stat carrying the scope path).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

xplane_pb2 = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2")

import profile_step  # noqa: E402


def _build_space(tmp_path):
    xs = xplane_pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    sm = plane.stat_metadata
    sm[1].id = 1
    sm[1].name = "tf_op"

    ops = [
        ("fusion.1", "jit(step)/jvp(step)/embed/dot_general", 400),
        ("fusion.2", "jit(step)/transpose(jvp(step))/embed/dot_general", 900),
        ("fusion.3", "jit(step)/jvp(step)/frame_msg_o2h/dot_general", 150),
        ("fusion.4", "jit(step)/transpose(jvp(step))/frame_msg_h2o/mul", 350),
        ("custom-call.5", "jit(step)/jvp(step)/segment_scan/pallas_call", 700),
        ("fusion.6", "jit(step)/adam/add", 200),
        ("copy.7", "no-scope-here", 50),
    ]
    md = plane.event_metadata
    line = plane.lines.add()
    line.name = "XLA Ops"
    line.timestamp_ns = 1000
    offset = 0
    for i, (name, tf_op, dur) in enumerate(ops, start=1):
        md[i].id = i
        md[i].name = name
        stat = md[i].stats.add()
        stat.metadata_id = 1
        stat.str_value = tf_op
        ev = line.events.add()
        ev.metadata_id = i
        ev.offset_ps = offset
        ev.duration_ps = dur
        offset += dur

    out = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(out)
    with open(out / "host.xplane.pb", "wb") as f:
        f.write(xs.SerializeToString())
    return str(tmp_path)


def test_scope_attribution_and_bwd_split(tmp_path):
    table, err = profile_step.summarize_xspace(_build_space(tmp_path))
    assert err is None
    assert table["plane"] == "/device:TPU:0"
    assert table["line"] == "XLA Ops"
    by_scope = {r["scope"]: r for r in table["by_scope"]}
    assert by_scope["embed"]["total_us"] == pytest.approx(400 / 1e6)
    assert by_scope["embed_bwd"]["total_us"] == pytest.approx(900 / 1e6)
    assert by_scope["frame_messages"]["total_us"] == pytest.approx(150 / 1e6)
    assert by_scope["frame_messages_bwd"]["total_us"] == pytest.approx(350 / 1e6)
    assert by_scope["segment_scan"]["total_us"] == pytest.approx(700 / 1e6)
    assert by_scope["adam"]["total_us"] == pytest.approx(200 / 1e6)
    assert by_scope["unattributed"]["total_us"] == pytest.approx(50 / 1e6)
    # Total busy time is the sum of all events.
    assert table["busy_us"] == pytest.approx(2750 / 1e6)
    # Op table still ranked by time.
    assert table["ops"][0]["op"] == "fusion.2"


def test_no_device_plane_reports_cleanly(tmp_path):
    xs = xplane_pb2.XSpace()
    p = xs.planes.add()
    p.name = "/host:CPU"
    out = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(out)
    with open(out / "host.xplane.pb", "wb") as f:
        f.write(xs.SerializeToString())
    table, err = profile_step.summarize_xspace(str(tmp_path))
    assert err == "no device plane in trace"
    assert "inventory" in table
