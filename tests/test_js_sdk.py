"""gstwebrtc-api JS SDK (gstpu/tools/gstwebrtc-api): the image has no
JS runtime, so these tests (a) keep the SDK's protocol vocabulary
structurally in sync with the server and (b) drive the exact message
sequences the SDK implements through the in-repo signalling server
with Python standing in for the browser."""

import json
import re
from pathlib import Path

from gstpu.net.webrtc.signalling import Server as SignallingState, welcome

SDK = Path(__file__).parent.parent / "gstpu" / "tools" / \
    "gstwebrtc-api" / "gstwebrtc-api.js"


def test_sdk_covers_protocol_vocabulary():
    js = SDK.read_text()
    # every message type the server speaks appears in the SDK
    for t in ("welcome", "peerStatusChanged", "list", "setPeerStatus",
              "startSession", "sessionStarted", "peer", "endSession",
              "error"):
        assert re.search(rf'"{t}"', js), f"SDK misses {t!r}"
    # API surface the reference SDK exposes (gstwebrtc-api.js)
    for api in ("createConsumerSession", "createProducerSession",
                "registerConnectionListener",
                "registerProducersListener", "getAvailableProducers"):
        assert api in js, api
    # consumer events per the reference consumer-session.js
    for ev in ("streamsChanged", "stateChanged", "error"):
        assert ev in js, ev


def test_consumer_flow_through_server():
    """The SDK's consumer sequence: welcome -> setPeerStatus(listener)
    -> list -> startSession -> peer(sdp answer/ice) -> endSession."""
    st = SignallingState()
    prod, _ = st.handle_connect()
    cons, _ = st.handle_connect()
    # producer announces
    out = st.handle_message(prod, {"type": "setPeerStatus",
                                     "roles": ["producer"],
                                     "meta": {"name": "cam"}})
    # consumer lists (what the SDK does on welcome)
    out = st.handle_message(cons, {"type": "list"})
    assert out == [(cons, {"type": "list", "producers": [
        {"id": prod, "meta": {"name": "cam"}}]})]
    # startSession
    out = st.handle_message(cons, {"type": "startSession",
                                     "peerId": prod})
    tgt = dict(out)
    sid = tgt[cons]["sessionId"]
    assert tgt[prod]["type"] == "startSession"
    assert tgt[prod]["sessionId"] == sid
    # producer sends the offer; consumer answers; ice both ways —
    # all forwarded verbatim
    for src, dst, payload in (
            (prod, cons, {"sdp": {"type": "offer", "sdp": "o"}}),
            (cons, prod, {"sdp": {"type": "answer", "sdp": "a"}}),
            (cons, prod, {"ice": {"candidate": "c",
                                      "sdpMLineIndex": 0}})):
        msg = {"type": "peer", "sessionId": sid, **payload}
        out = st.handle_message(src, msg)
        assert out == [(dst, msg)]
    # endSession reaches the other side
    out = st.handle_message(cons, {"type": "endSession",
                                     "sessionId": sid})
    assert out == [(prod, {"type": "endSession",
                             "sessionId": sid})]


def test_welcome_shape_matches_sdk_expectation():
    w = welcome("p1")
    assert json.dumps(w)           # serializable
    assert w == {"type": "welcome", "peerId": "p1"}
