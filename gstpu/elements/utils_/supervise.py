"""fallbackswitch, livesync, togglerecord: stream supervisors.

Rebuilds the reference failure-handling elements (SURVEY.md §5.3):
fallbackswitch's per-pad health timeout auto-failover
(utils/fallbackswitch/src/fallbackswitch/imp.rs:56-126), livesync's
gap filling with repeated frames/silence (utils/livesync), and
togglerecord's keyframe-aligned record gating with contiguous output
timestamps (utils/togglerecord/src/togglerecord/imp.rs:113-165).
"""

from __future__ import annotations

import numpy as np

from gstpu.core.buffer import Buffer, BufferFlags
from gstpu.core.caps import Caps
from gstpu.core.element import (Element, FlowReturn, Message, MessageType,
                                Pad, PadDirection, PadPresence,
                                PadTemplate)
from gstpu.core.event import (CapsEvent, EosEvent, Event, GapEvent,
                              Segment, SegmentEvent, StreamStartEvent)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element
from gstpu.runtime.scheduler import Task, TaskResult

SECOND = 1_000_000_000


def _tmpl(name, direction, presence=PadPresence.ALWAYS):
    return PadTemplate(name, direction, presence, Caps.any())


class _SwitchPad(Pad):
    def __init__(self, name, template, element):
        super().__init__(name, PadDirection.SINK, template, element)
        self.priority = 0
        self.last_activity: int | None = None
        self.chain_function = self._sw_chain
        self.event_function = self._sw_event

    def _sw_chain(self, pad, buf):
        return self.element._pad_chain(self, buf)  # type: ignore

    def _sw_event(self, pad, ev):
        return self.element._pad_event(self, ev)  # type: ignore


@register_element("fallbackswitch", Rank.NONE)
class FallbackSwitch(Element):
    """Auto-failover N->1 selector: forwards the highest-priority pad
    that produced data within `timeout`; switches to a lower-priority
    pad when the active one stalls, and back when it recovers
    (immediate-fallback semantics via the property)."""

    PAD_TEMPLATES = [
        _tmpl("src", PadDirection.SRC),
        _tmpl("sink_%u", PadDirection.SINK, PadPresence.REQUEST),
    ]

    timeout = Property(int, default=5 * SECOND, minimum=1,
                       mutable=Mutability.PLAYING)
    immediate_fallback = Property(bool, default=False,
                                  mutable=Mutability.READY)

    SIGNALS = ("active-pad-changed",)

    def __init__(self, name=None):
        super().__init__(name)
        self.srcpad = self.static_pad("src")
        self.active_pad: _SwitchPad | None = None
        self._src_started = False

    def request_pad(self, name=None) -> Pad:
        tmpl = self.PAD_TEMPLATES[1]
        i = 0
        n = name
        if n is None:
            while True:
                n = f"sink_{i}"
                if n not in self.pads:
                    break
                i += 1
        pad = _SwitchPad(n, tmpl, self)
        pad.priority = len([p for p in self.pads.values()
                            if isinstance(p, _SwitchPad)])
        self.add_pad(pad)
        return pad

    def _now(self) -> int:
        return (self.clock.time() - self.base_time) if self.clock else 0

    def _switch_pads(self) -> list[_SwitchPad]:
        return sorted((p for p in self.pads.values()
                       if isinstance(p, _SwitchPad)),
                      key=lambda p: p.priority)

    def _select(self, now: int) -> _SwitchPad | None:
        """Highest priority pad that is healthy (produced data within
        timeout)."""
        for p in self._switch_pads():
            if p.last_activity is not None \
                    and now - p.last_activity <= self.timeout:
                return p
        if self.immediate_fallback:
            for p in self._switch_pads():
                if p.last_activity is not None:
                    return p
        return None

    def _pad_chain(self, pad: _SwitchPad, buf: Buffer) -> FlowReturn:
        now = self._now()
        pad.last_activity = now
        best = self._select(now)
        if best is not None and best is not pad:
            return FlowReturn.OK  # a healthier, higher-priority pad wins
        if self.active_pad is not pad:
            self.active_pad = pad
            self.emit("active-pad-changed", pad)
            self.post_element_message("fallbackswitch-active-pad",
                                      pad=pad.name)
            caps = pad.get_sticky(CapsEvent)
            if caps is not None:
                self.srcpad.push_event(caps)
        if not self._src_started:
            self.srcpad.push_event(StreamStartEvent(f"{self.name}/src"))
            caps = pad.get_sticky(CapsEvent)
            if caps is not None:
                self.srcpad.push_event(caps)
            self.srcpad.push_event(SegmentEvent(Segment()))
            self._src_started = True
        return self.srcpad.push(buf)

    def _pad_event(self, pad: _SwitchPad, ev: Event) -> bool:
        if isinstance(ev, EosEvent):
            others = [p for p in self._switch_pads() if p is not pad]
            if all(p.eos for p in others):
                return self.srcpad.push_event(ev)
            return True
        if ev.sticky:
            return True  # replayed when the pad becomes active
        if pad is self.active_pad:
            return self.srcpad.push_event(ev)
        return True


@register_element("livesync", Rank.NONE)
class LiveSync(Element):
    requires_clock = True        # live element: pipeline selects a clock

    """Converts bursty/gappy input into gapless output by repeating the
    last buffer (or pushing silence) once per frame duration when the
    input stalls (reference utils/livesync/src/livesync/imp.rs:11-67).
    Driven by a scheduler task + the pipeline clock."""

    PAD_TEMPLATES = [_tmpl("sink", PadDirection.SINK),
                     _tmpl("src", PadDirection.SRC)]

    latency = Property(int, default=0, minimum=0,
                       mutable=Mutability.READY)
    duration = Property(int, default=SECOND // 30, minimum=1,
                        mutable=Mutability.READY,
                        blurb="Output frame duration when repeating (ns)")

    def __init__(self, name=None):
        super().__init__(name)
        self.sinkpad = self.static_pad("sink")
        self.srcpad = self.static_pad("src")
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self._last: Buffer | None = None
        self._next_pts: int | None = None
        self._eos = False
        self.dropped = 0
        self.duplicated = 0

    def _chain(self, pad, buf: Buffer) -> FlowReturn:
        dur = buf.duration if buf.duration is not None else self.duration
        if self._next_pts is not None and buf.pts is not None \
                and buf.pts < self._next_pts:
            self.dropped += 1
            return FlowReturn.OK  # behind schedule: drop
        self._last = buf
        self._next_pts = (buf.pts if buf.pts is not None
                          else (self._next_pts or 0)) + dur
        return self.srcpad.push(buf)

    def _event(self, pad, ev: Event) -> bool:
        if isinstance(ev, EosEvent):
            self._eos = True
        if isinstance(ev, GapEvent):
            self._fill_until(ev.pts + (ev.duration or 0))
            return True
        return self.srcpad.push_event(ev)

    def _fill_until(self, target_pts: int) -> None:
        while self._last is not None and self._next_pts is not None \
                and self._next_pts < target_pts:
            self._push_repeat()

    def _push_repeat(self) -> None:
        rep = self._last.copy()
        rep.pts = self._next_pts
        rep.duration = self._last.duration or self.duration
        rep.set_flag(BufferFlags.GAP)
        self.duplicated += 1
        self._next_pts += rep.duration
        self.srcpad.push(rep)

    def iterate_tasks(self):
        return (Task(f"{self.name}-fill", self._iterate),)

    def _iterate(self) -> TaskResult:
        if self._eos:
            return TaskResult.EOS
        if self.clock is None or self._last is None \
                or self._next_pts is None:
            return TaskResult.IDLE
        now = self.clock.time() - self.base_time
        if now >= self._next_pts + (self._last.duration
                                    or self.duration):
            self._push_repeat()
            return TaskResult.CONTINUE
        return TaskResult.IDLE


@register_element("togglerecord", Rank.NONE)
class ToggleRecord(Element):
    """Record gate: while `record` is true, forwards buffers starting
    at a keyframe, rewriting timestamps so recorded segments are
    contiguous (reference utils/togglerecord imp.rs:113-165)."""

    PAD_TEMPLATES = [_tmpl("sink", PadDirection.SINK),
                     _tmpl("src", PadDirection.SRC)]

    record = Property(bool, default=False, mutable=Mutability.PLAYING)
    is_live = Property(bool, default=False, mutable=Mutability.READY)

    SIGNALS = ("recording-changed",)

    def __init__(self, name=None):
        super().__init__(name)
        self.sinkpad = self.static_pad("sink")
        self.srcpad = self.static_pad("src")
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self._recording = False
        self._waiting_keyframe = False
        self._offset = 0             # subtracted from input pts
        self._last_out_end: int = 0  # end ts of last recorded buffer
        self._segment_start: int | None = None

    def _chain(self, pad, buf: Buffer) -> FlowReturn:
        want = self.record
        if want and not self._recording:
            self._waiting_keyframe = True
            self._recording = True
            self.emit("recording-changed", True)
        elif not want and self._recording:
            self._recording = False
            self._segment_start = None
            self.emit("recording-changed", False)

        if not self._recording:
            return FlowReturn.OK
        if self._waiting_keyframe:
            if not buf.is_keyframe():
                return FlowReturn.OK
            self._waiting_keyframe = False
            if buf.pts is not None:
                self._offset = buf.pts - self._last_out_end
                self._segment_start = buf.pts
        out = buf.copy()
        if out.pts is not None:
            out.pts -= self._offset
            self._last_out_end = out.pts + (out.duration or 0)
        return self.srcpad.push(out)

    def _event(self, pad, ev: Event) -> bool:
        return self.srcpad.push_event(ev)
