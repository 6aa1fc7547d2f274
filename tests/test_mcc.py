"""mccparse / mccenc tests (MacCaption ANC transfer files)."""

import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.elements.video.mcc import (decode_mcc_payload,
                                      encode_mcc_payload,
                                      mcc_timecode_to_ns,
                                      ns_to_mcc_timecode)

SECOND = 10**9


def test_alias_table_roundtrip():
    # every alias expands and re-compresses to itself
    for text, raw in (("G", b"\xfa\x00\x00"),
                      ("O", b"\xfa\x00\x00" * 9),
                      ("P", b"\xfb\x80\x80"),
                      ("Q", b"\xfc\x80\x80"),
                      ("R", b"\xfd\x80\x80"),
                      ("S", b"\x96\x69"),
                      ("T", b"\x61\x01"),
                      ("U", b"\xe1\x00\x00\x00"),
                      ("Z", b"\x00"),
                      ("4A", b"\x4a")):
        assert decode_mcc_payload(text) == raw
        assert encode_mcc_payload(raw) == text
    # 10 x FA0000 = O + G (greedy longest-first)
    assert encode_mcc_payload(b"\xfa\x00\x00" * 10) == "OG"
    assert decode_mcc_payload("OG") == b"\xfa\x00\x00" * 10


def test_timecode_drop_frame_roundtrip():
    # 29.97 DF: frame numbers 0,2 of each minute (except every 10th)
    # don't exist; conversion must be self-inverse across the jump
    for frames_tc in ("00:00:59;29", "00:01:00;02", "00:09:59;29",
                      "00:10:00;00", "01:23:45;17"):
        ns = mcc_timecode_to_ns(frames_tc, 30, True)
        assert ns_to_mcc_timecode(ns, 30, True) == frames_tc
    assert mcc_timecode_to_ns("00:00:01:00", 25, False) == SECOND


def _mcc_file(payload_lines):
    return ("File Format=MacCaption_MCC V1.0\r\n\r\n"
            "// comment line\r\n"
            "UUID=X\r\nCreation Program=test\r\n"
            "Time Code Rate=30DF\r\n\r\n"
            + "".join(payload_lines))


def test_mccparse_cdp(tmp_path):
    cdp = bytes([0x96, 0x69] + list(range(10)))
    line = ("00:00:01;00\tT" + f"{len(cdp):02X}"
            + encode_mcc_payload(cdp) + f"{sum(cdp) & 0xFF:02X}\r\n")
    f = tmp_path / "a.mcc"
    f.write_text(_mcc_file([line]))
    p = parse_launch(f"filesrc location={f} ! application/x-mcc ! "
                     f"mccparse ! appsink name=out")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    p.run()
    bufs = out.pull_all()
    assert out.caps[0].name == "closedcaption/x-cea-708"
    assert out.caps[0]["format"] == "cdp"
    assert len(bufs) == 1
    assert bufs[0].to_bytes() == cdp
    assert bufs[0].pts == mcc_timecode_to_ns("00:00:01;00", 30, True)
    p.set_state(State.NULL)


def test_mccparse_bad_header_errors(tmp_path):
    f = tmp_path / "bad.mcc"
    f.write_text("Scenarist_SCC V1.0\n")
    p = parse_launch(f"filesrc location={f} ! application/x-mcc ! "
                     f"mccparse ! fakesink")
    p.set_state(State.PLAYING)
    with pytest.raises(RuntimeError, match="pipeline error"):
        p.run()
    p.set_state(State.NULL)


def test_mcc_enc_parse_roundtrip():
    """cdp buffers -> mccenc -> mccparse -> identical buffers."""
    from gstpu.core.caps import parse_caps
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make

    enc = make("mccenc", uuid="0", fps=30, drop_frame=True)
    h = Harness(enc)
    h.set_caps("closedcaption/x-cea-708, format=cdp")
    payloads = [bytes([0x96, 0x69, i, 0xFA, 0x00, 0x00]) for i in
                range(3)]
    for i, pl in enumerate(payloads):
        h.push(Buffer(pl, pts=i * SECOND * 1001 // 30000))
    text = b"".join(b.to_bytes() for b in h.pull_all()).decode()
    assert text.startswith("File Format=MacCaption_MCC V1.0\r\n")
    assert "Time Code Rate=30DF" in text
    assert "\tT06" in text          # T alias for 61 01, len 6
    h.teardown()

    par = make("mccparse")
    h2 = Harness(par)
    h2.set_caps("application/x-mcc")
    h2.push(Buffer(text.encode()))
    h2.push_eos()
    outs = h2.pull_all()
    assert [b.to_bytes() for b in outs] == payloads
    assert outs[1].pts == SECOND * 1001 // 30000
    h2.teardown()


def test_mcc_enc_608_prefix():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    enc = make("mccenc", uuid="0")
    h = Harness(enc)
    h.set_caps("closedcaption/x-cea-608, format=raw")
    h.push(Buffer(b"\x94\x2c", pts=0))
    text = b"".join(b.to_bytes() for b in h.pull_all()).decode()
    assert "\t6102" in text and "T" not in text.split("\t")[-1][:1]
    h.teardown()
