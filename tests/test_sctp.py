"""SCTP association + WebRTC data channels (gstpu/net/webrtc/sctp.py)
and their ride inside DTLS application data through WebRtcTransport
(the str0m data-channel plane the reference's webrtcbin2 targets)."""

import pytest

from gstpu.net.webrtc.sctp import SctpAssociation, SctpError, crc32c


def _pump(a, b, rounds=30):
    for _ in range(rounds):
        moved = False
        while (d := a.poll_transmit()) is not None:
            b.handle_packet(d)
            moved = True
        while (d := b.poll_transmit()) is not None:
            a.handle_packet(d)
            moved = True
        if not moved:
            return


def test_crc32c_vector():
    # well-known CRC32c check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_association_and_channel():
    srv = SctpAssociation(client=False)
    cli = SctpAssociation(client=True)
    cli.connect()
    _pump(cli, srv)
    assert cli.established and srv.established
    sid = cli.create_channel("control")
    assert sid % 2 == 0                 # DTLS client: even ids
    _pump(cli, srv)
    assert ("channel-open", sid, "control") in srv.events
    assert ("channel-open", sid, "control") in cli.events
    cli.send(sid, b"hello")
    srv.send(sid, "text reply".encode(), binary=False)
    _pump(cli, srv)
    assert ("message", sid, 53, b"hello") in srv.events
    assert ("message", sid, 51, b"text reply") in cli.events


def test_large_message_fragments_and_reassembles():
    srv = SctpAssociation(client=False)
    cli = SctpAssociation(client=True)
    cli.connect()
    _pump(cli, srv)
    sid = cli.create_channel("bulk")
    _pump(cli, srv)
    big = bytes(range(256)) * 40        # 10240 B -> 9 fragments
    cli.send(sid, big)
    _pump(cli, srv)
    msgs = [e for e in srv.events if e[0] == "message"]
    assert msgs and msgs[-1][3] == big


def test_corrupt_packet_rejected():
    srv = SctpAssociation(client=False)
    cli = SctpAssociation(client=True)
    cli.connect()
    pkt = bytearray(cli.poll_transmit())
    pkt[-1] ^= 0xFF
    with pytest.raises(SctpError, match="CRC32c"):
        srv.handle_packet(bytes(pkt))
    assert not srv.established


def test_send_before_open_raises():
    cli = SctpAssociation(client=True)
    with pytest.raises(SctpError):
        cli.send(0, b"x")


def test_data_channels_over_dtls_transport():
    """Full composition: ICE + DTLS complete, then the SCTP
    association runs inside DTLS app-data records and a channel
    carries messages both ways."""
    from gstpu.net.webrtc.ice import host_candidate
    from gstpu.net.webrtc.transport import (RemoteDescription,
                                            WebRtcTransport)

    a = WebRtcTransport(controlling=True)
    b = WebRtcTransport(controlling=False)
    a.enable_data_channels()
    b.enable_data_channels()
    addr_a, addr_b = ("10.0.0.1", 1111), ("10.0.0.2", 2222)
    a.add_local_candidate(host_candidate(*addr_a))
    b.add_local_candidate(host_candidate(*addr_b))

    def desc(tr):
        d = tr.local_description()
        from gstpu.net.webrtc.ice import Candidate
        return RemoteDescription(
            d["ice-ufrag"], d["ice-pwd"], d["fingerprint"],
            [Candidate.parse(c) for c in d["candidates"]])

    b.set_remote_description(desc(a))
    a.set_remote_description(desc(b))

    def pump(rounds=60):
        for _ in range(rounds):
            moved = False
            for src, dst, src_addr in ((a, b, addr_a),
                                       (b, a, addr_b)):
                while (t := src.poll_transmit()) is not None:
                    data, _to = t
                    dst.handle_packet(data, src_addr)
                    moved = True
            if not moved:
                return

    pump()
    assert a.connected and b.connected
    sid = a.create_data_channel("chat")
    pump()
    assert any(e[0] == "channel-open" for e in b.sctp.events)
    a.send_data(sid, b"over dtls!")
    pump()
    msgs = [e for e in b.sctp.events if e[0] == "message"]
    assert msgs and msgs[-1][3] == b"over dtls!"
    b.send_data(sid, b"and back", binary=False)
    pump()
    msgs = [e for e in a.sctp.events if e[0] == "message"]
    assert msgs and msgs[-1][3] == b"and back"


def test_spoofed_vtag_discarded():
    srv = SctpAssociation(client=False)
    cli = SctpAssociation(client=True)
    cli.connect()
    _pump(cli, srv)
    assert srv.established
    # a packet with the wrong verification tag must be rejected even
    # with a valid checksum
    import struct
    from gstpu.net.webrtc.sctp import CT_HEARTBEAT, crc32c
    chunk = struct.pack(">BBH", CT_HEARTBEAT, 0, 4)
    hdr = struct.pack(">HHI", 5000, 5000, 0xDEADBEEF)
    pkt = bytearray(hdr + struct.pack(">I", 0) + chunk)
    struct.pack_into("<I", pkt, 8, crc32c(bytes(pkt)))
    with pytest.raises(SctpError, match="verification tag"):
        srv.handle_packet(bytes(pkt))


def test_retransmit_on_timeout_after_loss():
    srv = SctpAssociation(client=False)
    cli = SctpAssociation(client=True)
    cli.connect()
    _pump(cli, srv)
    sid = cli.create_channel("r")
    _pump(cli, srv)
    cli.send(sid, b"will be dropped")
    lost = cli.poll_transmit()
    assert lost is not None              # dropped on the floor
    assert not [e for e in srv.events if e[0] == "message"]
    cli.on_timeout()
    _pump(cli, srv)
    msgs = [e for e in srv.events if e[0] == "message"]
    assert msgs and msgs[-1][3] == b"will be dropped"
    # spurious retransmission doesn't double-deliver
    n = len([e for e in srv.events if e[0] == "message"])
    cli.on_timeout()
    _pump(cli, srv)
    assert len([e for e in srv.events
                if e[0] == "message"]) == n
    # SACKs pruned the buffer
    assert not cli._unacked


def test_fragment_loss_no_corruption():
    """Advisor r2 scenario: drop one datagram of a 2-fragment
    message, retransmit on timeout — the receiver must deliver the
    ORIGINAL message intact (delivery gated on cumulative TSN order,
    reassembly keyed by (sid, ssn)), and a following message must not
    be corrupted by a stranded head fragment."""
    srv = SctpAssociation(client=False)
    cli = SctpAssociation(client=True)
    cli.connect()
    _pump(cli, srv)
    sid = cli.create_channel("frag")
    _pump(cli, srv)
    big = bytes(1300)                    # 2 fragments (1200 + 100)
    cli.send(sid, big)
    first = cli.poll_transmit()          # drop the head fragment
    assert first is not None
    _pump(cli, srv)                      # tail arrives out of order
    assert not [e for e in srv.events if e[0] == "message"]
    cli.on_timeout()                     # retransmits both fragments
    _pump(cli, srv)
    msgs = [e for e in srv.events if e[0] == "message"]
    assert len(msgs) == 1 and msgs[0][3] == big
    # the next message is intact too (no stranded fragment state)
    cli.send(sid, b"next message")
    _pump(cli, srv)
    msgs = [e for e in srv.events if e[0] == "message"]
    assert msgs[-1][3] == b"next message"


def test_tsn_wraparound():
    """32-bit TSN wrap (initial TSN is random): serial arithmetic
    must keep SACK pruning and in-order delivery working across the
    0xFFFFFFFF -> 0 boundary."""
    srv = SctpAssociation(client=False)
    cli = SctpAssociation(client=True)
    cli._next_tsn = 0xFFFFFFFE           # wraps during the session
    cli.connect()
    _pump(cli, srv)
    sid = cli.create_channel("wrap")
    _pump(cli, srv)
    for i in range(6):
        cli.send(sid, b"m%d" % i)
        _pump(cli, srv)
    msgs = [e[3] for e in srv.events if e[0] == "message"]
    assert msgs == [b"m%d" % i for i in range(6)]
    assert not cli._unacked              # SACK pruning crossed the wrap
    assert cli._next_tsn < 16            # we really did wrap


def test_serial_arithmetic():
    from gstpu.net.webrtc.sctp import tsn_lt, tsn_lte
    assert tsn_lt(5, 6) and not tsn_lt(6, 5) and not tsn_lt(5, 5)
    assert tsn_lte(5, 5)
    # across the wrap: 0xFFFFFFFF precedes 0
    assert tsn_lt(0xFFFFFFFF, 0) and not tsn_lt(0, 0xFFFFFFFF)
    assert tsn_lt(0xFFFFFFF0, 0x10)
