"""gstwebrtc-api JS SDK (gstpu/tools/gstwebrtc-api): the image has no
JS runtime, so these tests (a) keep the SDK's protocol vocabulary
structurally in sync with the server and (b) drive the exact message
sequences the SDK implements through the in-repo signalling server
with Python standing in for the browser."""

import json
import re
from pathlib import Path

from gstpu.net.webrtc.signalling import Server as SignallingState, welcome

SDK_DIR = Path(__file__).parent.parent / "gstpu" / "tools" / \
    "gstwebrtc-api"
SDK_MODULES = ("gstwebrtc-api.js", "com-channel.js",
               "consumer-session.js", "producer-session.js",
               "webrtc-session.js", "remote-controller.js",
               "session-state.js", "keysyms.js", "index.js")


def _sdk_text() -> str:
    return "\n".join((SDK_DIR / m).read_text() for m in SDK_MODULES)


def test_sdk_covers_protocol_vocabulary():
    js = _sdk_text()
    # every message type the server speaks appears in the SDK
    for t in ("welcome", "peerStatusChanged", "list", "setPeerStatus",
              "startSession", "sessionStarted", "peer", "endSession",
              "error"):
        assert re.search(rf'"{t}"', js), f"SDK misses {t!r}"
    # API surface the reference SDK exposes (gstwebrtc-api.js)
    for api in ("createConsumerSession", "createProducerSession",
                "registerConnectionListener",
                "unregisterConnectionListener",
                "registerProducersListener",
                "unregisterProducersListener",
                "getAvailableProducers"):
        assert api in js, api
    # consumer events per the reference consumer-session.js
    for ev in ("streamsChanged", "stateChanged", "error",
               "remoteControllerChanged", "rtcPeerConnectionChanged",
               "closed"):
        assert ev in js, ev
    # producer events per the reference producer-session.js
    for ev in ("clientConsumerAdded", "clientConsumerRemoved"):
        assert ev in js, ev


def test_sdk_module_structure_mirrors_reference():
    """Every module of the reference SDK has a gstpu counterpart
    (keysyms via the Unicode keysym rule instead of the literal X11
    table); each exists and parses as an ES module (export present)."""
    for m in SDK_MODULES:
        src = (SDK_DIR / m).read_text()
        assert "export" in src, m


def test_remote_controller_speaks_gst_navigation():
    js = (SDK_DIR / "remote-controller.js").read_text()
    for ev in ("MouseMove", "MouseButtonPress", "MouseButtonRelease",
               "MouseScroll", "KeyPress", "KeyRelease"):
        assert ev in js, ev
    assert '"control"' in (SDK_DIR / "consumer-session.js").read_text()
    assert "sendControlRequest" in js
    # the keysym mapping handles the GstNavigation names the wpe-style
    # producers expect
    ks = (SDK_DIR / "keysyms.js").read_text()
    for name in ("BackSpace", "Return", "space", "Page_Up"):
        assert f'"{name}"' in ks, name


def test_consumer_session_handles_full_flow():
    js = (SDK_DIR / "consumer-session.js").read_text()
    # pending-ICE flush on sessionStarted (candidates gathered before
    # the server granted the id)
    assert "_pendingCandidates" in js
    assert "onSessionStarted" in js
    # stereo-Opus munge workaround mirrored from the reference
    assert "mungeStereo" in js and "sprop-stereo" in js
    # null candidate = end-of-candidates passthrough
    assert "RTCIceCandidate" in js


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
