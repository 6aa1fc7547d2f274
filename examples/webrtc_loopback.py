"""A complete standalone WebRTC session in one process: webrtcsink
spawns its own signalling server (run-signalling-server), webrtcsrc
connects to it by uri, and the whole session — registration, SDP,
ICE, DTLS, SRTP media, RTX retransmission, control/input data
channels — negotiates itself.  The consumer reads depayloaded media
from the typed audio_0 pad."""

import time

import gstpu

gstpu.init()
from gstpu import Buffer, Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.element import (Bus, Pad, PadDirection, PadPresence,
                                PadTemplate)
from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.registry import make

# -- producer: spawns the signalling server itself ----------------------
sink = make("webrtcsink", enable_data_transport=True,
            run_signalling_server=True)
sink.bus = Bus()
sink.set_state(State.PLAYING)
uri = None
while uri is None:
    while (m := sink.bus.pop()) is not None:
        if m.fields.get("name") == "signalling-server-started":
            uri = m.fields["uri"]
    time.sleep(0.01)
print("signalling server:", uri)

pad = sink.request_pad()
feeder = Pad("feed", PadDirection.SRC,
             PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                         Caps.any()))
feeder.link(pad)
feeder.push_event(StreamStartEvent("a"))
feeder.push_event(CapsEvent(parse_caps(
    "audio/x-alaw, rate=8000, channels=1")))
feeder.push_event(SegmentEvent(Segment()))
while not sink._sig_client.connected.is_set():
    time.sleep(0.01)

# -- consumer: connects by uri; everything else is automatic ------------
src = make("webrtcsrc", enable_data_transport=True, signaller_uri=uri)
src.set_state(State.PLAYING)

deadline = time.monotonic() + 15
while time.monotonic() < deadline:
    sink.pump()
    src.pump()
    trs = list(sink._transports.values())
    if trs and trs[0][0].connected and src._transport is not None \
            and src._transport.connected:
        break
    time.sleep(0.002)
print("transport connected:", bool(sink._transports))

got, media = [], []
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
    sink.pump()
    src.pump()
deadline = time.monotonic() + 10
while len(got) < 20 and time.monotonic() < deadline:
    sink.pump()
    src.pump()
    time.sleep(0.001)
print(f"{len(got)} SRTP-protected RTP packets decrypted end to end")

# the typed pad carries depayloaded a-law
apad = src.pads.get("audio_0")
if apad is not None:
    acap = Pad("acap", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    acap.chain_function = lambda p, b: (media.append(b)
                                        or gstpu.FlowReturn.OK)
    acap.event_function = lambda p, e: True
    apad.link(acap)
    feeder.push(Buffer(bytes([0x23]) * 160, pts=21 * 20_000_000,
                       duration=20_000_000))
    deadline = time.monotonic() + 5
    while not media and time.monotonic() < deadline:
        sink.pump()
        src.pump()
        time.sleep(0.001)
    print(f"typed pad {apad.name}: {len(media)} depayloaded "
          f"{apad.current_caps[0].name} buffers")

print("producer stats:", sink.stats["sessions"])
sink.set_state(State.NULL)
src.set_state(State.NULL)
