"""SCC file format tests: parse/enc roundtrip through the CEA-608
pipeline."""

import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.elements.video.scc import ns_to_timecode, timecode_to_ns

SECOND = 10**9


def test_timecode_conversion():
    assert timecode_to_ns("00:00:01:00") == SECOND
    assert timecode_to_ns("01:00:00:00") == 3600 * SECOND
    assert timecode_to_ns("00:00:00:15") == SECOND // 2
    assert ns_to_timecode(SECOND) == "00:00:01:00"
    # drop-frame: 00:01:00;02 is the first frame after the drop;
    # SMPTE DF tracks wall clock within ~75 ms
    df = timecode_to_ns("00:01:00;02")
    assert abs(df - 60 * SECOND) < 75_000_000


def test_scc_parse_pipeline(tmp_path):
    scc = ("Scenarist_SCC V1.0\n\n"
           "00:00:01:00\t9420 94ae 9452 c8c9 942f\n\n"
           "00:00:03:00\t942c\n")
    f = tmp_path / "t.scc"
    f.write_text(scc)
    p = parse_launch(f"filesrc location={f} ! application/x-scc ! "
                     "sccparse ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert len(bufs) == 6
    assert bufs[0].to_bytes() == bytes.fromhex("9420")
    assert bufs[0].pts == SECOND
    assert bufs[5].pts == 3 * SECOND
    assert sink.caps[0].name == "closedcaption/x-cea-608"
    p.set_state(State.NULL)


def test_scc_roundtrip_with_cea608():
    """text -> cea608 -> scc -> parse -> cea608 -> text roundtrip."""
    p = parse_launch("appsrc name=src ! text/x-raw, format=utf8 ! "
                     "tttocea608 ! sccenc ! sccparse ! cea608tott ! "
                     "appsink name=sink")
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    from gstpu.core.caps import parse_caps
    src.set_property("caps", parse_caps("text/x-raw, format=utf8"))
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(b"ROUND TRIP", pts=SECOND))
    src.end_of_stream()
    p.run()
    outs = [b.to_bytes().decode() for b in sink.pull_all()]
    assert outs == ["ROUND TRIP"]
    p.set_state(State.NULL)


def test_scc_bad_header_errors(tmp_path):
    f = tmp_path / "bad.scc"
    f.write_text("NOT AN SCC FILE\n00:00:01:00\t9420\n")
    p = parse_launch(f"filesrc location={f} ! application/x-scc ! "
                     "sccparse ! fakesink")
    p.set_state(State.PLAYING)
    with pytest.raises(RuntimeError):
        p.run()
    p.set_state(State.NULL)
