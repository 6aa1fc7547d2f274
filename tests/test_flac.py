"""FLAC codec + claxondec + hlscmafsink tests."""

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.codecs.flac import (FlacStreamDecoder, StreamInfo, crc8, crc16,
                               encode_verbatim)
from gstpu.core.audio import AudioInfo


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 known vectors
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_streaminfo_roundtrip():
    si = StreamInfo(4096, 4096, 48000, 2, 16, 123456)
    si2 = StreamInfo.parse(si.to_bytes())
    assert si2.sample_rate == 48000
    assert si2.channels == 2
    assert si2.bits_per_sample == 16
    assert si2.total_samples == 123456


@pytest.mark.parametrize("channels", [1, 2])
def test_verbatim_roundtrip(channels):
    rng = np.random.default_rng(8)
    pcm = rng.integers(-2**15, 2**15, (10000, channels)).astype(np.int16)
    stream = encode_verbatim(pcm, 44100, 16)
    dec = FlacStreamDecoder()
    dec.push(stream)
    outs = []
    while True:
        f = dec.poll()
        if f is None:
            break
        assert f.sample_rate == 44100
        outs.append(f.samples)
    got = np.concatenate(outs)
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


def test_incremental_feed():
    rng = np.random.default_rng(9)
    pcm = rng.integers(-1000, 1000, (5000, 1)).astype(np.int16)
    stream = encode_verbatim(pcm, 8000, 16)
    dec = FlacStreamDecoder()
    outs = []
    for i in range(0, len(stream), 333):
        dec.push(stream[i:i + 333])
        while True:
            f = dec.poll()
            if f is None:
                break
            outs.append(f.samples)
    got = np.concatenate(outs)
    np.testing.assert_array_equal(got[:, 0], pcm[:, 0].astype(np.int32))


def test_claxondec_pipeline(tmp_path):
    rng = np.random.default_rng(10)
    t = np.arange(20000) / 44100
    pcm = (10000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    f = tmp_path / "t.flac"
    f.write_bytes(encode_verbatim(pcm[:, None], 44100, 16))
    p = parse_launch(f"filesrc location={f} blocksize=1000 ! "
                     f"audio/x-flac ! claxondec ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    info = AudioInfo.from_caps(sink.caps)
    assert info.format == "S16LE"
    assert info.rate == 44100
    out = np.concatenate([info.view(b) for b in sink.pull_all()])[:, 0]
    np.testing.assert_array_equal(out, pcm)
    p.set_state(State.NULL)


def test_corrupt_flac_errors():
    dec = FlacStreamDecoder()
    with pytest.raises(ValueError):
        dec.push(b"NOTAFLAC" + b"\x00" * 100)
        dec.poll()


def test_hlscmafsink(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)   # restored after the test (a bare
    # os.chdir leaked the cwd into later tests: docs-cache/icecast)
    p = parse_launch(
        "appsrc name=src ! audio/x-opus, rate=48000, channels=2 ! "
        "cmafmux fragment-duration=100000000 ! "
        "hlscmafsink playlist-location=playlist.m3u8 "
        "init-location=init.mp4 target-duration=1")
    src = p.get_by_name("src")
    from gstpu.core.caps import parse_caps
    src.set_property("caps",
                     parse_caps("audio/x-opus, rate=48000, channels=2"))
    p.set_state(State.PLAYING)
    for i in range(15):
        src.push_buffer(Buffer(bytes([i]) * 20, pts=i * 20_000_000,
                               duration=20_000_000))
    src.end_of_stream()
    p.run()
    p.set_state(State.NULL)
    playlist = (tmp_path / "playlist.m3u8").read_text()
    assert playlist.startswith("#EXTM3U")
    assert '#EXT-X-MAP:URI="init.mp4"' in playlist
    assert "#EXT-X-ENDLIST" in playlist
    assert playlist.count("#EXTINF") >= 2
    assert (tmp_path / "init.mp4").exists()
    from gstpu.mux.boxes import parse_boxes
    init = parse_boxes((tmp_path / "init.mp4").read_bytes())
    assert [b.fourcc for b in init][:2] == ["ftyp", "moov"]
    seg0 = (tmp_path / "segment00000.m4s").read_bytes()
    segs = parse_boxes(seg0)
    assert "moof" in [b.fourcc for b in segs]
