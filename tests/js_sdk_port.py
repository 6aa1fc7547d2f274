"""Executable Python port of the gstwebrtc-api SDK's pure logic.

The image has no JS runtime, so the SDK's logic (stereo munge, peer
normalization, keysym mapping) gets execution coverage through this
port: the data tables are parsed out of the shipped .js sources (one
source of truth — editing the JS updates the port), and the dispatch
logic is mirrored statement for statement so the tests exercise the
same behavior the browser runs."""

from __future__ import annotations

import re
from pathlib import Path

SDK_DIR = Path(__file__).parent.parent / "gstpu" / "tools" / \
    "gstwebrtc-api"


# -- keysyms.js -------------------------------------------------------------

def _keysym_tables():
    src = (SDK_DIR / "keysyms.js").read_text()
    latin1 = {int(m.group(1), 16): m.group(2) for m in
              re.finditer(r'(0x[0-9a-f]+): "([^"]+)"', src)}
    renamed = {m.group(1): m.group(2) for m in
               re.finditer(r'"(\w+)": "(\w+)"', src)}
    set_src = src[src.index("new Set(["):]
    passthrough = set(re.findall(r'"(\w+)"',
                                 set_src[:set_src.index("])")]))
    return latin1, renamed, passthrough


_LATIN1, _RENAMED, _PASSTHROUGH = _keysym_tables()


def keysym_string(key, code=None):
    """Port of keysyms.js getKeysymString(key, code)."""
    if isinstance(key, str) and len(key) == 1:
        cp = ord(key)
        if cp in _LATIN1:
            return _LATIN1[cp]
        if 0x30 <= cp <= 0x39 or 0x41 <= cp <= 0x5A \
                or 0x61 <= cp <= 0x7A:
            return key
        return "U+" + format(cp, "04X")
    if isinstance(code, str):
        if code in _RENAMED:
            return _RENAMED[code]
        if code in _PASSTHROUGH:
            return code
    return "Unidentified"


# -- consumer-session.js mungeStereo ---------------------------------------

def munge_stereo(offer_sdp: str, answer_sdp: str) -> str:
    """Port of consumer-session.js mungeStereo: repeat stereo=1 in
    the answer for every payload the offer marked sprop-stereo."""
    stereo_payloads = set(
        re.findall(r"a=fmtp:(\d+) [^\r\n]*sprop-stereo", offer_sdp))
    for payload in stereo_payloads:
        if not re.search(rf"a=fmtp:{payload} [^\r\n]*stereo",
                         answer_sdp):
            answer_sdp = answer_sdp.replace(
                f"a=fmtp:{payload}", f"a=fmtp:{payload} stereo=1;")
    return answer_sdp


# -- com-channel.js asPeer ---------------------------------------------------

def as_peer(raw, own_id):
    """Port of com-channel.js asPeer: collapse the server's two peer
    spellings into {id, meta}, dropping self and malformed input."""
    if not isinstance(raw, dict):
        return None
    pid = raw.get("id", raw.get("peerId"))
    if not isinstance(pid, str) or not pid or pid == own_id:
        return None
    meta = raw.get("meta")
    return {"id": pid,
            "meta": meta if isinstance(meta, dict) else {}}
