"""STUN codec + sans-IO ICE agent tests (RFC 5389 / 8445).

Two agents (full-controlling vs lite-controlled) complete
connectivity checks through an in-memory packet exchange — the same
sans-IO strategy the reference relies on str0m for in webrtcbin2."""

import struct

import pytest

from gstpu.net.webrtc.stun import (ATTR_USERNAME,
                                   ATTR_XOR_MAPPED_ADDRESS,
                                   BINDING_REQUEST, BINDING_SUCCESS,
                                   StunMessage, is_stun, unxor_address,
                                   xor_address)
from gstpu.net.webrtc.ice import Candidate, IceAgent, host_candidate


def test_stun_roundtrip_with_integrity_and_fingerprint():
    key = b"VOkJxbRl1RmTxUk/WvJxBt"
    msg = StunMessage(BINDING_REQUEST)
    msg.add_username("evtj:h6vY")
    data = msg.to_bytes(key)
    assert is_stun(data)
    parsed = StunMessage.parse(data)
    assert parsed.msg_type == BINDING_REQUEST
    assert parsed.transaction_id == msg.transaction_id
    assert parsed.get(ATTR_USERNAME) == b"evtj:h6vY"
    assert parsed.verify_integrity(key, data)
    assert parsed.verify_fingerprint(data)
    # wrong key fails
    assert not parsed.verify_integrity(b"wrong", data)
    # tampering breaks both
    bad = bytearray(data)
    bad[21] ^= 0xFF
    assert not StunMessage.parse(bytes(bad)) \
        .verify_integrity(key, bytes(bad))


def test_xor_mapped_address_roundtrip():
    tid = bytes(range(12))
    v = xor_address(("192.168.1.77", 32853), tid)
    assert unxor_address(v, tid) == ("192.168.1.77", 32853)
    # the port/address really are XORed with the magic cookie
    xport, = struct.unpack_from(">H", v, 2)
    assert xport == 32853 ^ 0x2112


def test_candidate_sdp_roundtrip():
    c = host_candidate("10.0.0.5", 4444)
    line = c.to_sdp()
    d = Candidate.parse("a=" + line)
    assert d.addr == ("10.0.0.5", 4444)
    assert d.typ == "host"
    assert d.priority == c.priority
    # type preference 126 in the top byte
    assert c.priority >> 24 == 126


def _pump(a, a_addr, b, b_addr, max_iters=20):
    """Shuttle datagrams between two agents until both go quiet."""
    for _ in range(max_iters):
        moved = False
        while True:
            t = a.poll_transmit()
            if t is None:
                break
            data, to = t
            assert to == b_addr
            b.handle_packet(data, a_addr)
            moved = True
        while True:
            t = b.poll_transmit()
            if t is None:
                break
            data, to = t
            assert to == a_addr
            a.handle_packet(data, b_addr)
            moved = True
        if not moved:
            break


def test_ice_full_vs_lite_connectivity():
    lite = IceAgent(lite=True, ufrag="lituf", pwd="litepassword1234")
    full = IceAgent(controlling=True, ufrag="fuluf",
                    pwd="fullpassword1234")
    a_addr, b_addr = ("10.0.0.1", 5000), ("10.0.0.2", 6000)
    full.add_local_candidate(host_candidate(*a_addr))
    lite.add_local_candidate(host_candidate(*b_addr))
    # exchange candidates + credentials (the SDP step)
    full.set_remote_credentials(lite.local_ufrag, lite.local_pwd)
    lite.set_remote_credentials(full.local_ufrag, full.local_pwd)
    full.add_remote_candidate(
        Candidate.parse(lite.local_candidates[0].to_sdp()))
    lite.add_remote_candidate(
        Candidate.parse(full.local_candidates[0].to_sdp()))

    full.start_checks()
    _pump(full, a_addr, lite, b_addr)

    fev = full.events()
    lev = lite.events()
    assert ("connected",) == tuple(fev[0][:1])
    assert ("connected",) == tuple(lev[0][:1])
    assert full.selected is not None and full.selected.nominated
    assert lite.selected is not None and lite.selected.nominated
    assert full.selected.remote.addr == b_addr
    assert lite.selected.remote.addr == a_addr


def test_ice_rejects_wrong_password():
    lite = IceAgent(lite=True, ufrag="lituf", pwd="rightpassword123")
    full = IceAgent(controlling=True, ufrag="fuluf",
                    pwd="fullpassword1234")
    a_addr, b_addr = ("10.0.0.1", 5000), ("10.0.0.2", 6000)
    full.add_local_candidate(host_candidate(*a_addr))
    lite.add_local_candidate(host_candidate(*b_addr))
    # full agent got the WRONG password for the lite agent
    full.set_remote_credentials(lite.local_ufrag, "wrongpassword999")
    lite.set_remote_credentials(full.local_ufrag, full.local_pwd)
    full.add_remote_candidate(lite.local_candidates[0])
    lite.add_remote_candidate(full.local_candidates[0])
    full.start_checks()
    _pump(full, a_addr, lite, b_addr)
    assert lite.selected is None
    assert full.selected is None
    # the 401 comes back unauthenticated, so it cannot fail the pair
    # (spoofable); the check simply never succeeds
    assert not any(p.state == "succeeded" for p in full.pairs)
    assert ("connected",) not in [e[:1] for e in full.events()]


def test_ice_peer_reflexive_learning():
    """A lite agent learns an unknown remote from the binding
    request itself (peer-reflexive candidate)."""
    lite = IceAgent(lite=True, ufrag="lituf", pwd="litepassword1234")
    full = IceAgent(controlling=True, ufrag="fuluf",
                    pwd="fullpassword1234")
    nat_addr = ("203.0.113.9", 7000)   # unknown to the lite agent
    lite.add_local_candidate(host_candidate("10.0.0.2", 6000))
    full.add_local_candidate(host_candidate(*nat_addr))
    full.set_remote_credentials(lite.local_ufrag, lite.local_pwd)
    full.add_remote_candidate(lite.local_candidates[0])
    # lite agent has NO remote candidates
    full.start_checks()
    data, to = full.poll_transmit()
    lite.handle_packet(data, nat_addr)
    ev = lite.events()
    assert ev and ev[0][0] == "connected"
    assert lite.selected.remote.typ == "prflx"
    assert lite.selected.remote.addr == nat_addr


def test_non_stun_passthrough():
    agent = IceAgent(lite=True)
    assert agent.handle_packet(b"\x80\x60RTP-ish....", ("1.2.3.4", 1)) \
        is False
