"""Ogg container + Vorbis decoder tests against real files with
pygame's SDL decoder as the conformance oracle."""

import os

import numpy as np
import pytest

HOUSE = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/"
         "data/house_lo.ogg")


def test_ogg_pages_and_packets():
    from gstpu.codecs.ogg import packets_of, parse_pages
    data = open(HOUSE, "rb").read()
    pages = list(parse_pages(data))          # CRC-checked
    assert pages[0].bos and pages[-1].eos
    assert len({p.serial for p in pages}) == 1
    seqs = [p.page_seq for p in pages]
    assert seqs == list(range(len(seqs)))
    pkts = [p for p, _ in packets_of(data)]
    # vorbis: 3 header packets then audio packets
    assert pkts[0][:7] == b"\x01vorbis"
    assert pkts[1][:7] == b"\x03vorbis"
    assert pkts[2][:7] == b"\x05vorbis"
    assert len(pkts) > 100
    assert all(p[0] & 1 == 0 for p in pkts[3:])   # audio packets


def test_ogg_crc_detects_corruption():
    from gstpu.codecs.ogg import parse_pages
    data = bytearray(open(HOUSE, "rb").read())
    data[100] ^= 0xFF
    with pytest.raises(ValueError, match="crc"):
        list(parse_pages(bytes(data)))
