"""A complete WebRTC session in one process: webrtcsink produces,
webrtcsrc consumes — signalling, ICE, DTLS, SRTP and a control data
channel all run over real local UDP sockets."""

import time

import gstpu

gstpu.init()
from gstpu import Buffer, Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                PadTemplate)
from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.registry import make

sink = make("webrtcsink", enable_data_transport=True)
src = make("webrtcsrc", enable_data_transport=True)
sink.set_state(State.PLAYING)
src.set_state(State.PLAYING)

pad = sink.request_pad()
feeder = Pad("feed", PadDirection.SRC,
             PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                         Caps.any()))
feeder.link(pad)
feeder.push_event(StreamStartEvent("a"))
feeder.push_event(CapsEvent(parse_caps(
    "audio/x-alaw, rate=8000, channels=1")))
feeder.push_event(SegmentEvent(Segment()))

sink.signalling_connect({"peerId": "prod"})
src.signalling_connect({"peerId": "cons"})
src.handle_signalling({"type": "list", "producers": [{"id": "prod"}]})
offer = sink.handle_signalling({"type": "startSession",
                                "sessionId": "s1", "peerId": "cons"})
answer = src.handle_signalling({**offer[0], "sessionId": "s1"})
sink.handle_signalling({**answer[0], "sessionId": "s1"})

tr = sink._transports["s1"][0]
deadline = time.monotonic() + 10
while time.monotonic() < deadline and not (
        tr.connected and src._transport and src._transport.connected):
    sink.pump()
    src.pump()
    time.sleep(0.001)
print("transport connected:", tr.connected)

got = []
cap = Pad("cap", PadDirection.SINK,
          PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                      Caps.any()))
cap.chain_function = lambda p, b: (got.append(b)
                                   or gstpu.FlowReturn.OK)
cap.event_function = lambda p, e: True
src.srcpad.link(cap)

for i in range(20):
    feeder.push(Buffer(bytes([0x55]) * 160, pts=i * 20_000_000,
                       duration=20_000_000))
deadline = time.monotonic() + 10
while len(got) < 20 and time.monotonic() < deadline:
    sink.pump()
    src.pump()
    time.sleep(0.001)
print(f"{len(got)} SRTP-protected RTP packets decrypted end to end")
print("producer stats:", sink.stats["sessions"])
print("consumer stats:", {k: v for k, v in src.stats.items()
                          if k != "sync-maps"})
sink.set_state(State.NULL)
src.set_state(State.NULL)
