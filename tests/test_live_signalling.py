"""Standalone production flow: webrtcsink spawns its own signalling
server (run-signalling-server), webrtcsrc connects by signaller-uri,
and the whole session — registration, listing, SDP exchange, ICE,
DTLS, SRTP media — runs with NO manual message shuttling (reference
signaller::uri + run-signalling-server surface)."""

import time

from gstpu import Buffer, Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.element import Bus, Pad, PadDirection, PadPresence, PadTemplate
from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.registry import make


def test_standalone_session_over_live_signalling():
    import gstpu

    sink = make("webrtcsink", enable_data_transport=True,
                run_signalling_server=True)
    sink.bus = Bus()
    sink.set_state(State.PLAYING)
    # the server's uri is announced on the bus
    uri = None
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline and uri is None:
        while (m := sink.bus.pop()) is not None:
            if m.fields.get("name") == "signalling-server-started":
                uri = m.fields["uri"]
        time.sleep(0.01)
    assert uri and uri.startswith("ws://127.0.0.1:")

    pad = sink.request_pad()
    feeder = Pad("feed", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("a"))
    feeder.push_event(CapsEvent(parse_caps(
        "audio/x-alaw, rate=8000, channels=1")))
    feeder.push_event(SegmentEvent(Segment()))

    # wait for the producer to be registered before the consumer lists
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline \
            and not sink._sig_client.connected.is_set():
        time.sleep(0.01)
    assert sink.peer_id is not None

    src = make("webrtcsrc", enable_data_transport=True,
               signaller_uri=uri)
    src.bus = Bus()
    src.set_state(State.PLAYING)

    # the signalling threads negotiate the session by themselves;
    # we only pump the media transports
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline:
        sink.pump()
        src.pump()
        trs = list(sink._transports.values())
        if trs and trs[0][0].connected and src._transport is not None \
                and src._transport.connected:
            break
        time.sleep(0.002)
    assert sink._transports, "no session was started over signalling"
    assert list(sink._transports.values())[0][0].connected
    assert src._transport is not None and src._transport.connected

    out = []
    cap = Pad("cap", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (out.append(b)
                                       or gstpu.FlowReturn.OK)
    cap.event_function = lambda p, e: True
    src.srcpad.link(cap)

    for i in range(5):
        feeder.push(Buffer(bytes([0x55]) * 160, pts=i * 20_000_000,
                           duration=20_000_000))
    deadline = time.monotonic() + 10
    while len(out) < 5 and time.monotonic() < deadline:
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert len(out) >= 5
    assert out[0].to_bytes()[12:] == bytes([0x55]) * 160

    # the negotiated stream also surfaces DEPAYLOADED on a typed pad
    # (reference webrtcsrc audio_%u/video_%u, imp.rs:1945-1953)
    apad = src.pads.get("audio_0")
    assert apad is not None
    media = []
    acap = Pad("acap", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    acap.chain_function = lambda p, b: (media.append(b)
                                        or gstpu.FlowReturn.OK)
    acap.event_function = lambda p, e: True
    apad.link(acap)
    feeder.push(Buffer(bytes([0x23]) * 160, pts=6 * 20_000_000,
                       duration=20_000_000))
    deadline = time.monotonic() + 10
    while not media and time.monotonic() < deadline:
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert media and media[0].to_bytes() == bytes([0x23]) * 160
    assert apad.current_caps[0].name == "audio/x-alaw"

    src.set_state(State.NULL)
    sink.set_state(State.NULL)
    # teardown stopped the client and the embedded server
    assert sink._sig_client is None and sink._sig_server is None
