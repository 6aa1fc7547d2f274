"""ISO BMFF (MP4) box serialization + parsing.

Rebuilds the box layer of the reference isobmff crate
(mux/isobmff/src/isobmff/boxes.rs + fmp4mux/boxes.rs): ftyp/styp,
moov (trak/mdia/stbl sample tables, mvex/trex), moof (mfhd/traf/
tfhd/tfdt/trun), mdat, codec sample entries (avc1/hvc1/av01/opus/
fLaC/mp4a/raw audio). The parser is used by the round-trip tests
(reference mux/isobmff/tests pattern: mux then parse back).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from fractions import Fraction

SECOND = 1_000_000_000


def box(fourcc: str, *payloads: bytes) -> bytes:
    body = b"".join(payloads)
    return struct.pack(">I", 8 + len(body)) + fourcc.encode("ascii") + body


def full_box(fourcc: str, version: int, flags: int,
             *payloads: bytes) -> bytes:
    return box(fourcc, struct.pack(">I", (version << 24) | flags),
               *payloads)


def u8(v): return struct.pack(">B", v)
def u16(v): return struct.pack(">H", v)
def u32(v): return struct.pack(">I", v & 0xFFFFFFFF)
def u64(v): return struct.pack(">Q", v)
def i16(v): return struct.pack(">h", v)
def i32(v): return struct.pack(">i", v)
def fixed16_16(v: float): return u32(int(round(v * 65536)))
def fixed8_8(v: float): return u16(int(round(v * 256)) & 0xFFFF)


UNITY_MATRIX = (u32(0x00010000) + u32(0) + u32(0)
                + u32(0) + u32(0x00010000) + u32(0)
                + u32(0) + u32(0) + u32(0x40000000))


def ftyp(major: str, minor: int, compatible: list[str]) -> bytes:
    return box("ftyp", major.encode(), u32(minor),
               b"".join(b.encode() for b in compatible))


def styp(major: str, minor: int, compatible: list[str]) -> bytes:
    return box("styp", major.encode(), u32(minor),
               b"".join(b.encode() for b in compatible))


# ---------------------------------------------------------------------------
# Track/stream description
# ---------------------------------------------------------------------------

@dataclass
class StreamConfig:
    """Everything the muxer needs to describe one track."""

    track_id: int
    timescale: int
    is_video: bool
    caps_name: str
    # audio
    channels: int = 2
    sample_rate: int = 48000
    # video
    width: int = 0
    height: int = 0
    # codec private data (avcC/hvcC/av1C/dOps/dfLa payload etc.)
    codec_data: bytes = b""
    language: str = "und"
    # timed metadata track (ONVIF XML: metx sample entry, meta handler,
    # nmhd media header — reference mux/fmp4 onvif variant)
    is_meta: bool = False
    meta_namespace: str = ""


def _sample_entry_audio(fourcc: str, cfg: StreamConfig,
                        extra: bytes = b"") -> bytes:
    body = (b"\x00" * 6 + u16(1)            # reserved + data_ref_index
            + u32(0) + u32(0)               # reserved
            + u16(cfg.channels) + u16(16)   # channelcount, samplesize
            + u16(0) + u16(0)               # predefined, reserved
            + fixed16_16(cfg.sample_rate))
    return box(fourcc, body, extra)


def _sample_entry_video(fourcc: str, cfg: StreamConfig,
                        extra: bytes = b"") -> bytes:
    body = (b"\x00" * 6 + u16(1)
            + u16(0) + u16(0)               # predefined, reserved
            + u32(0) * 3
            + u16(cfg.width) + u16(cfg.height)
            + fixed16_16(72.0) + fixed16_16(72.0)  # dpi
            + u32(0) + u16(1)               # reserved, frame_count
            + b"\x00" * 32                  # compressor name
            + u16(0x0018) + i16(-1))        # depth, predefined
    return box(fourcc, body, extra)


def sample_entry(cfg: StreamConfig) -> bytes:
    """Codec-specific sample entry (reference boxes.rs codec builders)."""
    n = cfg.caps_name
    if cfg.is_meta:
        # metx: XML metadata sample entry (ISO 14496-12 12.3.3)
        return box("metx", b"\x00" * 6 + u16(1),
                   b"\x00",                       # content_encoding
                   cfg.meta_namespace.encode() + b"\x00",
                   b"\x00")                       # schema_location
    if n == "video/x-h264":
        return _sample_entry_video("avc1", cfg,
                                   box("avcC", cfg.codec_data))
    if n == "video/x-h265":
        return _sample_entry_video("hvc1", cfg,
                                   box("hvcC", cfg.codec_data))
    if n == "video/x-av1":
        return _sample_entry_video("av01", cfg,
                                   box("av1C", cfg.codec_data))
    if n == "video/x-vp9":
        return _sample_entry_video("vp09", cfg,
                                   box("vpcC", cfg.codec_data))
    if n == "audio/x-opus":
        # dOps: version 0, channel count, pre-skip, input rate, gain
        dops = (u8(0) + u8(cfg.channels) + u16(312)
                + u32(cfg.sample_rate) + u16(0) + u8(0))
        return _sample_entry_audio("Opus", cfg, box("dOps", dops))
    if n == "audio/x-flac":
        return _sample_entry_audio("fLaC", cfg,
                                   full_box("dfLa", 0, 0,
                                            cfg.codec_data))
    if n == "audio/mpeg":  # AAC
        esds = full_box("esds", 0, 0, cfg.codec_data)
        return _sample_entry_audio("mp4a", cfg, esds)
    if n == "audio/x-raw":
        return _sample_entry_audio("sowt", cfg)
    raise ValueError(f"unsupported codec for mp4: {n}")


def _hdlr(cfg: StreamConfig) -> bytes:
    if cfg.is_meta:
        return full_box("hdlr", 0, 0, u32(0), b"meta", u32(0) * 3,
                        b"MetadataHandler\x00")
    handler = b"vide" if cfg.is_video else b"soun"
    name = b"VideoHandler\x00" if cfg.is_video else b"SoundHandler\x00"
    return full_box("hdlr", 0, 0, u32(0), handler, u32(0) * 3, name)


def _mdhd(cfg: StreamConfig, duration: int) -> bytes:
    lang = cfg.language
    packed = (((ord(lang[0]) - 0x60) << 10) | ((ord(lang[1]) - 0x60) << 5)
              | (ord(lang[2]) - 0x60))
    return full_box("mdhd", 0, 0, u32(0), u32(0), u32(cfg.timescale),
                    u32(duration), u16(packed), u16(0))


def _tkhd(cfg: StreamConfig, duration_mvts: int) -> bytes:
    flags = 0x7  # enabled | in movie | in preview
    body = (u32(0) + u32(0) + u32(cfg.track_id) + u32(0)
            + u32(duration_mvts)
            + u32(0) * 2 + i16(0) + i16(0)
            + (fixed8_8(1.0) if not cfg.is_video else fixed8_8(0.0))
            + u16(0) + UNITY_MATRIX
            + fixed16_16(cfg.width) + fixed16_16(cfg.height))
    return full_box("tkhd", 0, flags, body)


def _dinf() -> bytes:
    url = full_box("url ", 0, 1)
    dref = full_box("dref", 0, 0, u32(1), url)
    return box("dinf", dref)


def _stbl(cfg: StreamConfig, samples: list["Mp4Sample"] | None = None,
          chunk_offsets: list[int] | None = None) -> bytes:
    stsd = full_box("stsd", 0, 0, u32(1), sample_entry(cfg))
    if not samples:
        # empty tables (fragmented)
        stts = full_box("stts", 0, 0, u32(0))
        stsc = full_box("stsc", 0, 0, u32(0))
        stsz = full_box("stsz", 0, 0, u32(0), u32(0))
        stco = full_box("stco", 0, 0, u32(0))
        return box("stbl", stsd, stts, stsc, stsz, stco)
    # non-fragmented sample tables
    # stts: run-length encode durations
    runs = []
    for s in samples:
        if runs and runs[-1][1] == s.duration:
            runs[-1][0] += 1
        else:
            runs.append([1, s.duration])
    stts = full_box("stts", 0, 0, u32(len(runs)),
                    b"".join(u32(c) + u32(d) for c, d in runs))
    # one chunk per sample (simple + valid)
    stsc = full_box("stsc", 0, 0, u32(1), u32(1) + u32(1) + u32(1))
    stsz = full_box("stsz", 0, 0, u32(0), u32(len(samples)),
                    b"".join(u32(len(s.data)) for s in samples))
    stco = full_box("stco", 0, 0, u32(len(chunk_offsets)),
                    b"".join(u32(o) for o in chunk_offsets))
    boxes = [stsd, stts, stsc, stsz, stco]
    sync = [i + 1 for i, s in enumerate(samples) if s.keyframe]
    if cfg.is_video and len(sync) != len(samples):
        boxes.append(full_box("stss", 0, 0, u32(len(sync)),
                              b"".join(u32(i) for i in sync)))
    return box("stbl", *boxes)


def _minf(cfg: StreamConfig, stbl: bytes) -> bytes:
    if cfg.is_meta:
        header = full_box("nmhd", 0, 0)
    elif cfg.is_video:
        header = full_box("vmhd", 0, 1, u16(0), u16(0) * 3)
    else:
        header = full_box("smhd", 0, 0, u16(0), u16(0))
    return box("minf", header, _dinf(), stbl)


def trak(cfg: StreamConfig, duration: int = 0,
         movie_timescale: int = 1000,
         samples: list["Mp4Sample"] | None = None,
         chunk_offsets: list[int] | None = None) -> bytes:
    dur_mvts = duration * movie_timescale // cfg.timescale \
        if duration else 0
    mdia = box("mdia", _mdhd(cfg, duration), _hdlr(cfg),
               _minf(cfg, _stbl(cfg, samples, chunk_offsets)))
    return box("trak", _tkhd(cfg, dur_mvts), mdia)


def mvhd(movie_timescale: int, duration: int, next_track: int) -> bytes:
    return full_box("mvhd", 0, 0, u32(0), u32(0), u32(movie_timescale),
                    u32(duration), fixed16_16(1.0), fixed8_8(1.0),
                    b"\x00" * 10, UNITY_MATRIX, b"\x00" * 24,
                    u32(next_track))


def trex(track_id: int) -> bytes:
    return full_box("trex", 0, 0, u32(track_id), u32(1), u32(0), u32(0),
                    u32(0))


def moov(configs: list[StreamConfig], movie_timescale: int = 1000,
         fragmented: bool = True, durations: dict[int, int] | None = None,
         samples: dict[int, list["Mp4Sample"]] | None = None,
         chunk_offsets: dict[int, list[int]] | None = None) -> bytes:
    durations = durations or {}
    total = max((durations.get(c.track_id, 0) * movie_timescale
                 // c.timescale for c in configs), default=0)
    parts = [mvhd(movie_timescale, total,
                  max(c.track_id for c in configs) + 1)]
    for c in configs:
        parts.append(trak(c, durations.get(c.track_id, 0),
                          movie_timescale,
                          (samples or {}).get(c.track_id),
                          (chunk_offsets or {}).get(c.track_id)))
    if fragmented:
        parts.append(box("mvex", *[trex(c.track_id) for c in configs]))
    return box("moov", *parts)


# ---------------------------------------------------------------------------
# fragments
# ---------------------------------------------------------------------------

@dataclass
class Mp4Sample:
    data: bytes
    duration: int          # in track timescale
    keyframe: bool = True
    composition_offset: int = 0


TRUN_DATA_OFFSET = 0x000001
TRUN_FIRST_SAMPLE_FLAGS = 0x000004
TRUN_DURATION = 0x000100
TRUN_SIZE = 0x000200
TRUN_FLAGS = 0x000400
TRUN_CTS = 0x000800


def moof(seqno: int, runs: list[tuple[int, int, list[Mp4Sample]]]) -> bytes:
    """runs: [(track_id, base_decode_time, samples)]. Computes the
    data offsets so that mdat payload immediately follows."""
    # build twice: first to learn sizes, then with offsets
    def build(offsets: list[int]) -> bytes:
        parts = [full_box("mfhd", 0, 0, u32(seqno))]
        for (track_id, bdt, samples), off in zip(runs, offsets):
            tfhd = full_box("tfhd", 0, 0x020000, u32(track_id))
            tfdt = full_box("tfdt", 1, 0, u64(bdt))
            flags = (TRUN_DATA_OFFSET | TRUN_DURATION | TRUN_SIZE
                     | TRUN_FLAGS | TRUN_CTS)
            entries = []
            for s in samples:
                sflags = 0x00010000 if not s.keyframe else 0x02000000
                entries.append(u32(s.duration) + u32(len(s.data))
                               + u32(sflags) + i32(s.composition_offset))
            trun = full_box("trun", 1, flags, u32(len(samples)),
                            i32(off), b"".join(entries))
            parts.append(box("traf", tfhd, tfdt, trun))
        return box("moof", *parts)

    probe = build([0] * len(runs))
    moof_size = len(probe)
    offsets = []
    data_off = moof_size + 8  # mdat header
    for _, _, samples in runs:
        offsets.append(data_off)
        data_off += sum(len(s.data) for s in samples)
    return build(offsets)


def mdat(payload: bytes) -> bytes:
    return box("mdat", payload)


# ---------------------------------------------------------------------------
# parser (for tests and demuxing)
# ---------------------------------------------------------------------------

@dataclass
class ParsedBox:
    fourcc: str
    offset: int
    size: int
    data: bytes
    children: list["ParsedBox"] = field(default_factory=list)

    def find(self, path: str) -> "ParsedBox | None":
        parts = path.split(".")
        cur = self
        for p in parts:
            nxt = None
            for c in cur.children:
                if c.fourcc == p:
                    nxt = c
                    break
            if nxt is None:
                return None
            cur = nxt
        return cur

    def find_all(self, fourcc: str) -> list["ParsedBox"]:
        return [c for c in self.children if c.fourcc == fourcc]


_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl", "mvex", "moof",
               "traf", "edts", "dinf", "udta"}


def parse_boxes(data: bytes, offset: int = 0) -> list[ParsedBox]:
    out = []
    pos = 0
    while pos + 8 <= len(data):
        size, = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4:pos + 8].decode("latin1")
        if size == 1:
            size, = struct.unpack_from(">Q", data, pos + 8)
            body = data[pos + 16:pos + size]
        elif size == 0:
            size = len(data) - pos
            body = data[pos + 8:]
        else:
            body = data[pos + 8:pos + size]
        b = ParsedBox(fourcc, offset + pos, size, body)
        if fourcc in _CONTAINERS:
            b.children = parse_boxes(body, offset + pos + 8)
        out.append(b)
        if size <= 0:
            break
        pos += size
    return out
