"""raptorqenc/raptorqdec FEC tests."""

import random

import pytest

from gstpu import Buffer
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.net.fec import decode_block, encode_repair
from gstpu.net.rtp.packet import RtpPacket


def _rtp(seq, body):
    return RtpPacket(payload_type=96, seqnum=seq, timestamp=seq * 90,
                     ssrc=42, payload=body).to_bytes()


def _run_chain(drop: set[int], k=4, r=2, n=8):
    """n source packets through enc, dropping source seqnums in
    `drop`, through dec; returns recovered packet bytes in order."""
    enc = Harness(make("raptorqenc", symbols_per_block=k,
                       repair_packets=r))
    enc.set_caps("application/x-rtp")
    pkts_in = [_rtp(100 + i, bytes([i]) * (10 + i)) for i in range(n)]
    for p in pkts_in:
        enc.push(Buffer(p))
    enc.push_eos()
    wire = [b.to_bytes() for b in enc.pull_all()]
    enc.teardown()
    # k source then r repair per block
    dec = Harness(make("raptorqdec"))
    dec.set_caps("application/x-rtp")
    for w in wire:
        pkt = RtpPacket.parse(w)
        if pkt.payload_type != 97 and pkt.seqnum in drop:
            continue
        dec.push(Buffer(w))
    dec.push_eos()
    out = [b.to_bytes() for b in dec.pull_all()]
    dec.teardown()
    return pkts_in, out, dec


def test_no_loss_passthrough():
    pkts, out, _ = _run_chain(set())
    assert out == pkts


def test_recovers_dropped_packets():
    pkts, out, dec = _run_chain({101, 103, 105})  # <= r per block
    assert out == pkts


def test_unrecoverable_block_flushes_remainder():
    # drop 3 of 4 in the first block with only 2 repairs
    pkts, out, dec = _run_chain({100, 101, 102})
    assert pkts[3] in out                   # survivor passes through
    assert all(p in out for p in pkts[4:])  # second block intact
    assert len(out) == 5


def test_repair_packet_shape():
    enc = Harness(make("raptorqenc", symbols_per_block=2,
                       repair_packets=1, repair_pt=111))
    enc.set_caps("application/x-rtp")
    enc.push(Buffer(_rtp(7, b"aa")))
    enc.push(Buffer(_rtp(8, b"bbbb")))
    outs = [RtpPacket.parse(b.to_bytes()) for b in enc.pull_all()]
    assert [p.payload_type for p in outs] == [96, 96, 111]
    rep = outs[2].payload
    assert int.from_bytes(rep[:2], "big") == 7      # base seqnum
    assert rep[2] == 2 and rep[3] == 2              # k, esi
    enc.teardown()
