"""webrtcsink enable-data-channel-navigation: consumer input messages
become upstream NavigationEvents on the producing video pads
(reference net/webrtc/src/webrtcsink/imp.rs:433-471
create_navigation_event + imp.rs:1815-1845 input channel)."""

import json

from gstpu import Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.element import Pad, PadDirection, PadPresence, PadTemplate
from gstpu.core.event import (CapsEvent, NavigationEvent, Segment,
                              SegmentEvent, StreamStartEvent)
from gstpu.core.registry import make

VCAPS = ("video/x-raw, format=I420, width=64, height=64, "
         "framerate=30/1")
ACAPS = ("audio/x-raw, format=S16LE, rate=48000, channels=1, "
         "layout=interleaved")


class _Tr:
    """Transport stand-in: just the channel-id attributes the
    navigation dispatch reads."""

    def __init__(self, input_ch=None):
        self._gstpu_input_channel = input_ch


def _feed(sink, caps_str, name_hint):
    pad = sink.request_pad()
    feeder = Pad("feed", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent(name_hint))
    feeder.push_event(CapsEvent(parse_caps(caps_str)))
    feeder.push_event(SegmentEvent(Segment()))
    events = []
    feeder.event_function = lambda p, e: events.append(e) or True
    return pad, events


def _sink(**props):
    sink = make("webrtcsink", **props)
    sink.set_state(State.PLAYING)
    return sink


def test_input_channel_message_reaches_video_pads():
    sink = _sink(enable_data_channel_navigation=True)
    vpad, vevents = _feed(sink, VCAPS, "v")
    apad, aevents = _feed(sink, ACAPS, "a")
    tr = _Tr(input_ch=7)
    msg = json.dumps({"event": "MouseButtonPress", "x": 12, "y": 34,
                      "button": 1, "modifier_state": 0})
    assert sink._maybe_navigation(7, tr, msg)
    navs = [e for e in vevents if isinstance(e, NavigationEvent)]
    assert len(navs) == 1
    assert navs[0].nav_type == "MouseButtonPress"
    assert navs[0].structure["x"] == 12
    assert navs[0].structure["button"] == 1
    # audio pads never receive navigation (reference routes to
    # video_ pads only)
    assert not [e for e in aevents if isinstance(e, NavigationEvent)]


def test_mid_routes_to_one_pad():
    sink = _sink(enable_data_channel_navigation=True)
    pad0, ev0 = _feed(sink, VCAPS, "v0")
    pad1, ev1 = _feed(sink, VCAPS, "v1")
    tr = _Tr(input_ch=3)
    msg = json.dumps({"event": "MouseMove", "x": 1, "y": 2,
                      "mid": pad1.name})
    assert sink._maybe_navigation(3, tr, msg)
    assert not [e for e in ev0 if isinstance(e, NavigationEvent)]
    navs = [e for e in ev1 if isinstance(e, NavigationEvent)]
    assert len(navs) == 1 and navs[0].nav_type == "MouseMove"
    # the mid field does not leak into the event structure
    assert "mid" not in navs[0].structure


def test_control_channel_envelope_accepted():
    """This SDK's remote-controller sends navigation inside the
    control-channel request envelope; the sink accepts both."""
    sink = _sink(enable_data_channel_navigation=True)
    _pad, events = _feed(sink, VCAPS, "v")
    tr = _Tr(input_ch=None)
    msg = json.dumps({"id": 4, "request": {
        "type": "navigation",
        "data": {"event": "KeyPress", "key": "a",
                 "modifier_state": 0}}})
    assert sink._maybe_navigation(5, tr, msg)
    navs = [e for e in events if isinstance(e, NavigationEvent)]
    assert len(navs) == 1 and navs[0].structure["key"] == "a"


def test_disabled_by_default():
    sink = _sink()
    _pad, events = _feed(sink, VCAPS, "v")
    tr = _Tr(input_ch=7)
    msg = json.dumps({"event": "MouseButtonPress", "x": 1, "y": 1})
    assert not sink._maybe_navigation(7, tr, msg)
    assert not [e for e in events if isinstance(e, NavigationEvent)]


def test_non_navigation_messages_pass_through():
    sink = _sink(enable_data_channel_navigation=True)
    _feed(sink, VCAPS, "v")
    tr = _Tr(input_ch=None)
    assert not sink._maybe_navigation(5, tr, "not json")
    assert not sink._maybe_navigation(
        5, tr, json.dumps({"id": 1, "request": {"type": "other"}}))


def test_navigation_rides_live_session():
    """End to end over the real transport: a consumer-side
    NavigationEvent pushed upstream into webrtcsrc rides the
    producer's 'input' data channel (ICE+DTLS+SCTP over live UDP)
    and comes out as an upstream NavigationEvent on the producer's
    video pad — the reference's remote-control flow
    (webrtcsink/imp.rs:1815-1845 + webrtcsrc/imp.rs:126-134)."""
    import time

    from gstpu.core.element import Bus

    sink = _sink(enable_data_transport=True,
                 enable_data_channel_navigation=True)
    src = make("webrtcsrc", enable_data_transport=True,
               enable_data_channel_navigation=True)
    sink.bus = Bus()
    src.bus = Bus()
    src.set_state(State.PLAYING)

    # producer video input (pre-encoded path: only the caps matter
    # for navigation routing)
    _vpad, vevents = _feed(sink, "video/x-vp8, width=64, height=64",
                           "v")

    sink.signalling_connect({"peerId": "prod"})
    src.signalling_connect({"peerId": "cons"})
    src.handle_signalling(
        {"type": "list", "producers": [{"id": "prod"}]})
    offer = sink.handle_signalling(
        {"type": "startSession", "sessionId": "s1", "peerId": "cons"})
    answer = src.handle_signalling({**offer[0], "sessionId": "s1"})
    sink.handle_signalling({**answer[0], "sessionId": "s1"})

    deadline = time.monotonic() + 10
    tr = sink._transports["s1"][0]
    while time.monotonic() < deadline and not (
            tr.connected and src._transport
            and src._transport.connected):
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert tr.connected and src._transport.connected

    # wait until the producer's input channel is announced through
    # DCEP on the consumer side
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and src._input_channel is None:
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert src._input_channel is not None

    # downstream display sink sends its user's click upstream
    cap = Pad("cap", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.event_function = lambda p, e: True
    src.srcpad.link(cap)
    assert cap.push_event(NavigationEvent(
        event="MouseButtonPress", x=320, y=200, button=1,
        modifier_state=0))

    deadline = time.monotonic() + 10
    navs = []
    while time.monotonic() < deadline and not navs:
        sink.pump()
        src.pump()
        navs = [e for e in vevents if isinstance(e, NavigationEvent)]
        time.sleep(0.001)
    assert navs and navs[0].nav_type == "MouseButtonPress"
    assert navs[0].structure["x"] == 320
    sink.set_state(State.NULL)
    src.set_state(State.NULL)
