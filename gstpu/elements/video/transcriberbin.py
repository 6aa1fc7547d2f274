"""transcriberbin: wire a speech transcriber into a caption path.

Rebuilds the reference transcriberbin's topology (video/closedcaption/
src/transcriberbin/imp.rs): audio tees into a pluggable transcriber
(any element description producing text/x-raw), whose transcript runs
through tttocea608 into cccombiner's caption pad; video flows through
cccombiner so frames leave with VideoCaptionMeta attached.  With no
transcriber configured (the reference's cloud transcribers need
credentials/egress) the bin degrades to passthrough, matching the
reference's error fallback (imp.rs:284).
"""

from __future__ import annotations

from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import (Element, FlowReturn, Pad, PadDirection,
                                PadPresence, PadTemplate, State)
from gstpu.core.event import Event
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, make, register_element
from gstpu.core.video import video_caps


def _cap_pad(name, chain, event):
    p = Pad(name, PadDirection.SINK,
            PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                        Caps.any()))
    p.chain_function = chain
    p.event_function = event
    return p


@register_element("transcriberbin", Rank.NONE)
class TranscriberBin(Element):
    PAD_TEMPLATES = [
        PadTemplate("sink_video", PadDirection.SINK,
                    PadPresence.ALWAYS, video_caps()),
        PadTemplate("sink_audio", PadDirection.SINK,
                    PadPresence.ALWAYS, Caps.new("audio/x-raw")),
        PadTemplate("src_video", PadDirection.SRC, PadPresence.ALWAYS,
                    video_caps()),
        PadTemplate("src_audio", PadDirection.SRC, PadPresence.ALWAYS,
                    Caps.new("audio/x-raw")),
    ]

    transcriber = Property(str, default=None, mutable=Mutability.READY,
                           blurb="Transcriber element description "
                                 "(audio in, text/x-raw out)")
    passthrough = Property(bool, default=False,
                           mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self._vsink = self.static_pad("sink_video")
        self._asink = self.static_pad("sink_audio")
        self._vsrc = self.static_pad("src_video")
        self._asrc = self.static_pad("src_audio")
        self._vsink.chain_function = self._video_chain
        self._vsink.event_function = self._video_event
        self._asink.chain_function = self._audio_chain
        self._asink.event_function = self._audio_event
        self._trans = None
        self._combiner = None
        self._active = False

    # -- wiring ----------------------------------------------------------
    def start(self) -> bool:
        if self.passthrough or not self.transcriber:
            self._active = False
            return True
        from gstpu.elements.utils_.fallbacksrc import _make_from_desc
        try:
            self._trans = _make_from_desc(self.transcriber)
        except Exception as e:
            self.post_error(f"transcriberbin: cannot make transcriber "
                            f"{self.transcriber!r}: {e}")
            return False
        self._ttto = make("tttocea608")
        self._combiner = make("cccombiner")
        for el in (self._trans, self._ttto, self._combiner):
            el.bus = self.bus
            el.clock = self.clock
            el.set_state(State.PLAYING)
        # internal feeder so the bin can push into the transcriber
        def feeder(name, target):
            f = Pad(name, PadDirection.SRC,
                    PadTemplate("src", PadDirection.SRC,
                                PadPresence.ALWAYS, Caps.any()))
            f.link(target)
            return f

        self._afeed = feeder("afeed", self._trans.static_pad("sink"))
        # transcriber -> tttocea608 -> combiner caption pad
        self._trans.src_pads()[0].link(self._ttto.static_pad("sink"))
        self._vfeed = feeder("vfeed",
                             self._combiner.request_pad("sink"))
        self._ttto.static_pad("src").link(
            self._combiner.request_pad())           # caption pad
        cap = _cap_pad("combined",
                       lambda p, b: self._vsrc.push(b),
                       lambda p, e: True)
        self._combiner.static_pad("src").link(cap)
        self._active = True
        return True

    def stop(self) -> bool:
        for el in (self._trans, getattr(self, "_ttto", None),
                   self._combiner):
            if el is not None:
                el.set_state(State.NULL)
        self._active = False
        return True

    # -- dataflow ---------------------------------------------------------
    def _video_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        if not self._active:
            return self._vsrc.push(buf)
        return self._vfeed.push(buf)

    def _video_event(self, pad: Pad, ev: Event) -> bool:
        ok = True
        if self._active:
            ok = self._vfeed.push_event(ev)
        else:
            ok = self._vsrc.push_event(ev)
        return ok

    def _audio_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        if self._active:
            self._afeed.push(buf.copy())
        return self._asrc.push(buf)

    def _audio_event(self, pad: Pad, ev: Event) -> bool:
        if self._active:
            self._afeed.push_event(ev)
        return self._asrc.push_event(ev)


@register_element("translationbin", Rank.NONE)
class TranslationBin(TranscriberBin):
    """transcriberbin with a translation stage: the transcript runs
    through a pluggable `translator` element (text/x-raw in and out)
    before caption encoding (reference translationbin wires cloud
    translators; any local element description works here)."""

    translator = Property(str, default=None, mutable=Mutability.READY,
                          blurb="Translator element description "
                                "(text/x-raw in/out)")

    def start(self) -> bool:
        if not super().start():
            return False
        if not self._active or not self.translator:
            return True
        from gstpu.elements.utils_.fallbacksrc import _make_from_desc
        try:
            trans = _make_from_desc(self.translator)
        except Exception as e:
            self.post_error(f"translationbin: bad translator: {e}")
            return False
        trans.bus = self.bus
        trans.set_state(State.PLAYING)
        # splice: transcriber -> translator -> tttocea608
        self._trans.src_pads()[0].unlink()
        self._trans.src_pads()[0].link(trans.static_pad("sink"))
        trans.src_pads()[0].link(self._ttto.static_pad("sink"))
        self._translator = trans
        return True

    def stop(self) -> bool:
        tr = getattr(self, "_translator", None)
        if tr is not None:
            tr.set_state(State.NULL)
        return super().stop()
