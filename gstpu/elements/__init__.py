"""Element library (L4'): mirrors the reference's plugin categories.

Each module self-registers its elements via @register_element when
imported; gstpu.init() imports everything through register_all().
The _MODULES list grows as element families are added.
"""

from __future__ import annotations

import importlib

_MODULES = [
    "gstpu.elements.generic.basic",
    "gstpu.elements.generic.app",
    "gstpu.elements.generic.testsrc",
    "gstpu.elements.generic.file",
    "gstpu.elements.generic.compress",
    "gstpu.elements.generic.plumbing",
    "gstpu.elements.generic.sodium",
    "gstpu.elements.generic.blocking_adapter",
    "gstpu.elements.audio.audiofx",
    "gstpu.elements.audio.g711",
    "gstpu.elements.audio.convert",
    "gstpu.elements.audio.claxon",
    "gstpu.elements.audio.lewton",
    "gstpu.elements.audio.agingradio",
    "gstpu.elements.audio.audioparsers",
    "gstpu.elements.audio.loudnorm",
    "gstpu.elements.audio.hrtf",
    "gstpu.elements.audio.rnnoise",
    "gstpu.elements.audio.opus",
    "gstpu.elements.audio.demucs",
    "gstpu.elements.audio.whisper",
    "gstpu.elements.audio.cloudstt",
    "gstpu.elements.audio.elevenlabs",
    "gstpu.elements.video.hsv",
    "gstpu.elements.video.av1",
    "gstpu.elements.video.vpx",
    "gstpu.elements.video.colorlut",
    "gstpu.elements.video.videofx",
    "gstpu.elements.video.convert",
    "gstpu.elements.video.scale",
    "gstpu.elements.video.viuer",
    "gstpu.elements.video.compositor",
    "gstpu.elements.video.image",
    "gstpu.elements.video.closedcaption",
    "gstpu.elements.video.scc",
    "gstpu.elements.video.mcc",
    "gstpu.elements.video.cea708",
    "gstpu.elements.video.st2038",
    "gstpu.elements.video.ttjson",
    "gstpu.elements.video.st2038demux",
    "gstpu.elements.video.ccoverlay",
    "gstpu.elements.video.cccombiner",
    "gstpu.elements.video.transcriberbin",
    "gstpu.elements.video.cdg",
    "gstpu.elements.mux.fmp4",
    "gstpu.elements.mux.mpegts",
    "gstpu.elements.mux.flvdemux",
    "gstpu.elements.net.rtp_elements",
    "gstpu.elements.net.rtp_video",
    "gstpu.elements.net.udp",
    "gstpu.elements.net.tcp",
    "gstpu.elements.net.rtsp",
    "gstpu.elements.net.hls",
    "gstpu.elements.net.mpegtslive",
    "gstpu.elements.net.raptorq",
    "gstpu.elements.net.webrtcsink",
    "gstpu.elements.net.httpsrc",
    "gstpu.elements.net.quic",
    "gstpu.elements.net.aws",
    "gstpu.elements.net.aws_ai",
    "gstpu.elements.net.janusvr",
    "gstpu.elements.net.aws_transcribe",
    "gstpu.elements.net.ueps",
    "gstpu.elements.net.awskvs",
    "gstpu.elements.net.icecast",
    "gstpu.elements.net.dash",
    "gstpu.elements.net.gccbwe",
    "gstpu.elements.net.onvif",
    "gstpu.elements.utils_.supervise",
    "gstpu.elements.utils_.fallbacksrc",
    "gstpu.elements.utils_.uriplaylistbin",
    "gstpu.elements.utils_.debugsei",
    "gstpu.elements.text.textelements",
    "gstpu.elements.text.llm",
    "gstpu.elements.analytics.analytics",
    "gstpu.elements.generic.aliases",
]

_registered = False


def register_all() -> None:
    global _registered
    if _registered:
        return
    _registered = True
    for mod in _MODULES:
        importlib.import_module(mod)
