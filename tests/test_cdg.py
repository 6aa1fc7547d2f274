"""CD+G decoder tests with synthetically-built subcode packets."""

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.codecs.cdg import (CMD_CDG, INSN_COLORS_LOW,
                              INSN_MEMORY_PRESET, INSN_TILE_NORMAL,
                              INSN_TILE_XOR, CdgDecoder)
from gstpu.core.video import VideoInfo


def pkt(insn: int, data: bytes) -> bytes:
    body = bytes([CMD_CDG, insn, 0, 0]) + data.ljust(16, b"\x00") \
        + bytes(4)
    assert len(body) == 24
    return body


def color_table_low(colors):
    data = bytearray()
    for r, g, b in colors:
        r4, g4, b4 = r // 17, g // 17, b // 17
        data.append(((r4 << 2) | (g4 >> 2)) & 0x3F)
        data.append((((g4 & 0x03) << 4) | b4) & 0x3F)
    return pkt(INSN_COLORS_LOW, bytes(data))


def tile(insn, c0, c1, row, col, rows):
    data = bytes([c0, c1, row, col]) + bytes(rows)
    return pkt(insn, data)


def test_decoder_memory_preset_and_palette():
    d = CdgDecoder()
    d.push_packet(color_table_low([(255, 0, 0), (0, 255, 0)] + [(0, 0, 0)] * 6))
    assert tuple(d.palette[0]) == (255, 0, 0)
    assert tuple(d.palette[1]) == (0, 255, 0)
    changed = d.push_packet(pkt(INSN_MEMORY_PRESET, bytes([1, 0])))
    assert changed
    rgb = d.render_rgb()
    assert tuple(rgb[100, 100]) == (0, 255, 0)


def test_decoder_tile_and_xor():
    d = CdgDecoder()
    d.push_packet(color_table_low([(0, 0, 0), (255, 255, 255),
                                   (255, 0, 0)] + [(0, 0, 0)] * 5))
    # tile at tile-row 2, tile-col 3: all pixels color1 (0b111111 rows)
    d.push_packet(tile(INSN_TILE_NORMAL, 0, 1, 2, 3, [0x3F] * 12))
    rgb = d.render_rgb()
    assert tuple(rgb[2 * 12 + 3, 3 * 6 + 2]) == (255, 255, 255)
    assert tuple(rgb[0, 0]) == (0, 0, 0)
    # xor with color 3 (1^2=3): white pixels flip
    d.push_packet(tile(INSN_TILE_XOR, 0, 2, 2, 3, [0x3F] * 12))
    rgb = d.render_rgb()
    assert (d.screen[24:36, 18:24] == 3).all()


def test_cdg_pipeline(tmp_path):
    stream = (color_table_low([(0, 0, 255)] + [(0, 0, 0)] * 7)
              + pkt(INSN_MEMORY_PRESET, bytes([0, 0]))
              + tile(INSN_TILE_NORMAL, 0, 0, 1, 1, [0x3F] * 12))
    f = tmp_path / "t.cdg"
    f.write_bytes(stream)
    p = parse_launch(f"filesrc location={f} ! video/x-cdg ! cdgparse ! "
                     f"cdgdec ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert len(bufs) == 3  # palette change + preset + tile
    vi = VideoInfo.from_caps(sink.caps)
    assert (vi.width, vi.height) == (300, 216)
    frame = vi.view(bufs[-1])
    assert tuple(frame[100, 100]) == (0, 0, 255)  # blue preset
    # packets timestamped at 300/s
    assert bufs[1].pts - bufs[0].pts == 10**9 // 300
    p.set_state(State.NULL)
