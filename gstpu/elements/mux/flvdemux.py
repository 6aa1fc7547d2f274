"""rsflvdemux: FLV demuxer element
(reference mux/flavors/src/flvdemux/imp.rs, push mode)."""

from __future__ import annotations

from gstpu.core.buffer import Buffer, BufferFlags
from gstpu.core.caps import Caps
from gstpu.core.element import (Element, FlowReturn, Pad, PadDirection,
                                PadPresence, PadTemplate)
from gstpu.core.event import (CapsEvent, EosEvent, Event, Segment,
                              SegmentEvent, StreamStartEvent)
from gstpu.core.registry import Rank, register_element
from gstpu.mux.flv import (AUDIO_FORMATS, TAG_AUDIO, TAG_SCRIPT, TAG_VIDEO,
                           VIDEO_CODECS, FlvParser, FlvTag)

MSECOND = 1_000_000


@register_element("rsflvdemux", Rank.PRIMARY)
class FlvDemux(Element):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    Caps.new("video/x-flv")),
        PadTemplate("audio", PadDirection.SRC, PadPresence.SOMETIMES,
                    Caps.any()),
        PadTemplate("video", PadDirection.SRC, PadPresence.SOMETIMES,
                    Caps.any()),
    ]

    SIGNALS = ("pad-added",)

    def __init__(self, name=None):
        super().__init__(name)
        self.sinkpad = self.static_pad("sink")
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self._parser = FlvParser()
        self._audio_pad: Pad | None = None
        self._video_pad: Pad | None = None
        self._avc_codec_data: bytes | None = None

    def _ensure_pad(self, kind: str, caps: Caps) -> Pad:
        existing = self._audio_pad if kind == "audio" else self._video_pad
        if existing is not None:
            return existing
        tmpl = next(t for t in self.PAD_TEMPLATES
                    if t.name_template == kind)
        pad = Pad(kind, PadDirection.SRC, tmpl, self)
        self.add_pad(pad)
        if kind == "audio":
            self._audio_pad = pad
        else:
            self._video_pad = pad
        self.emit("pad-added", pad)
        pad.push_event(StreamStartEvent(f"{self.name}/{kind}"))
        pad.push_event(CapsEvent(caps))
        pad.push_event(SegmentEvent(Segment()))
        return pad

    def _audio_caps(self, tag: FlvTag) -> Caps:
        name, _ = AUDIO_FORMATS.get(tag.sound_format,
                                    ("audio/x-flv-unknown", "?"))
        return Caps.new(name, rate=tag.sound_rate,
                        channels=tag.sound_channels)

    def _video_caps(self, tag: FlvTag) -> Caps:
        name = VIDEO_CODECS.get(tag.video_codec, "video/x-flv-unknown")
        if tag.video_codec == 7 and self._avc_codec_data:
            return Caps.new(name, stream_format="avc",
                            codec_data=self._avc_codec_data.hex())
        return Caps.new(name)

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        try:
            self._parser.push(buf.to_bytes())
            while True:
                tag = self._parser.poll()
                if tag is None:
                    break
                ret = self._handle_tag(tag)
                if not ret.is_ok:
                    return ret
        except ValueError as e:
            self.post_error(f"flvdemux: {e}")
            return FlowReturn.ERROR
        return FlowReturn.OK

    def _handle_tag(self, tag: FlvTag) -> FlowReturn:
        if tag.tag_type == TAG_SCRIPT:
            return FlowReturn.OK  # metadata: ignored for now
        if tag.tag_type == TAG_AUDIO:
            if not tag.data:
                return FlowReturn.OK
            pad = self._ensure_pad("audio", self._audio_caps(tag))
            out = Buffer(tag.audio_payload,
                         pts=tag.timestamp_ms * MSECOND)
            return pad.push(out)
        if tag.tag_type == TAG_VIDEO:
            if not tag.data:
                return FlowReturn.OK
            if tag.video_codec == 7 and tag.avc_packet_type == 0:
                # AVC sequence header = codec_data; (re)announce caps
                self._avc_codec_data = tag.video_payload
                if self._video_pad is not None:
                    self._video_pad.push_event(
                        CapsEvent(self._video_caps(tag)))
                return FlowReturn.OK
            pad = self._ensure_pad("video", self._video_caps(tag))
            out = Buffer(tag.video_payload,
                         pts=tag.timestamp_ms * MSECOND)
            if not tag.is_keyframe:
                out.set_flag(BufferFlags.DELTA_UNIT)
            return pad.push(out)
        return FlowReturn.OK

    def _event(self, pad: Pad, ev: Event) -> bool:
        if isinstance(ev, EosEvent):
            ok = True
            for p in (self._audio_pad, self._video_pad):
                if p is not None:
                    ok = p.push_event(EosEvent()) and ok
            return ok
        if isinstance(ev, (CapsEvent, StreamStartEvent, SegmentEvent)):
            return True  # we produce our own on the src pads
        return self.default_pad_event(pad, ev)
