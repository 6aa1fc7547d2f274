"""fallbacksrc: self-healing supervisory source.

Rebuilds the reference fallbacksrc
(utils/fallbackswitch/src/fallbacksrc/imp.rs:41-224): wraps a primary
source element and an optional fallback source; monitors dataflow
health, switches to the fallback when the primary stalls or errors,
and retries the primary with a restart timeout. Exposes `statistics`
like the reference's property.

In this framework sources are wrapped directly (the reference wraps
URIs via uridecodebin): set `source` / `fallback-source` to element
factory strings parsed like gst-launch fragments (e.g.
"audiotestsrc freq=440").
"""

from __future__ import annotations

import shlex

from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import (Element, FlowReturn, Message, MessageType,
                                Pad, PadDirection, PadPresence,
                                PadTemplate, State)
from gstpu.core.event import (CapsEvent, EosEvent, Event, Segment,
                              SegmentEvent, StreamStartEvent)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, make, register_element
from gstpu.runtime.scheduler import Task, TaskResult

SECOND = 1_000_000_000


def _make_from_desc(desc: str):
    parts = shlex.split(desc)
    el = make(parts[0])
    for tok in parts[1:]:
        k, _, v = tok.partition("=")
        from gstpu.core.parse import _parse_prop_value
        el.set_property(k, _parse_prop_value(v))
    return el


@register_element("fallbacksrc", Rank.NONE)
class FallbackSrc(Element):
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC,
                                 PadPresence.ALWAYS, Caps.any())]

    source = Property(str, default=None, mutable=Mutability.READY,
                      blurb="Primary source description")
    fallback_source = Property(str, default=None,
                               mutable=Mutability.READY)
    uri = Property(str, default=None, mutable=Mutability.READY,
                   blurb="Primary as a URI (file:/http(s):), like the "
                         "reference's uri property; overrides source")
    fallback_uri = Property(str, default=None,
                            mutable=Mutability.READY)
    timeout = Property(int, default=5 * SECOND, minimum=1,
                       mutable=Mutability.READY,
                       blurb="Stall timeout before failover (ns)")
    restart_timeout = Property(int, default=5 * SECOND, minimum=0,
                               mutable=Mutability.READY,
                               blurb="Primary retry interval (ns)")
    retry_timeout = Property(int, default=60 * SECOND, minimum=0,
                             mutable=Mutability.READY,
                             blurb="Give up retrying the primary "
                                   "after this long (0 = forever)")
    restart_on_eos = Property(bool, default=False,
                              mutable=Mutability.READY,
                              blurb="Restart the primary on EOS "
                                    "instead of ending the stream")
    immediate_fallback = Property(bool, default=False,
                                  mutable=Mutability.READY,
                                  blurb="Start on the fallback until "
                                        "the primary produces")
    enable_dummy = Property(bool, default=False,
                            mutable=Mutability.READY,
                            blurb="Synthesize a dummy fallback "
                                  "(videotestsrc black / silence) "
                                  "when none is configured")
    manual_unblock = Property(bool, default=False,
                              mutable=Mutability.READY,
                              blurb="Hold output until unblock() "
                                    "(reference manual-unblock + "
                                    "unblock signal)")

    SIGNALS = ("status-changed", "unblock")

    def __init__(self, name=None):
        super().__init__(name)
        self.srcpad = self.static_pad("src")
        self._primary: Element | None = None
        self._fallback: Element | None = None
        self._active: Element | None = None
        self._capture: Pad | None = None
        self._last_buffer_time: int | None = None
        self._primary_failed_at: int | None = None
        self.stats = {"num_retry": 0, "num_fallback_switches": 0,
                      "buffering_percent": 100, "using_fallback": False,
                      "last_retry_time": None}
        self._blocked = False
        self._first_failed_at: int | None = None
        self.connect("unblock", lambda *a: self.unblock())

    # -- statistics property (reference imp.rs:41-76) -------------------
    @property
    def statistics(self) -> dict:
        return dict(self.stats)

    def _now(self) -> int:
        return (self.clock.time() - self.base_time) if self.clock else 0

    def _wire(self, el: Element) -> None:
        cap = Pad("cap", PadDirection.SINK,
                  PadTemplate("sink", PadDirection.SINK,
                              PadPresence.ALWAYS, Caps.any()))
        cap.chain_function = self._on_child_buffer
        cap.event_function = self._on_child_event
        for sp in el.src_pads():
            if not sp.is_linked():
                sp.link(cap)
                break
        self._capture = cap

    def unblock(self) -> None:
        """Release output held by manual-unblock (reference's unblock
        action signal)."""
        self._blocked = False

    def _on_child_buffer(self, pad: Pad, buf: Buffer) -> FlowReturn:
        self._last_buffer_time = self._now()
        if self._blocked:
            return FlowReturn.OK           # held until unblock()
        return self.srcpad.push(buf)

    def _on_child_event(self, pad: Pad, ev: Event) -> bool:
        if isinstance(ev, EosEvent) and self._active is self._primary:
            if self.restart_on_eos:
                # reference restart-on-eos: loop the primary
                self.stats["num_retry"] += 1
                self._primary = self._make_primary()
                self._activate(self._primary)
                return True
            if self._fallback is not None:
                # primary ended unexpectedly: fail over instead of EOS
                self._fail_primary()
                return True
        return self.srcpad.push_event(ev)

    # -- source construction ------------------------------------------------
    @staticmethod
    def _desc_for_uri(uri: str) -> str:
        from urllib.parse import urlparse
        u = urlparse(uri)
        if u.scheme in ("http", "https"):
            return f"reqwesthttpsrc location={uri}"
        return f"filesrc location={u.path or uri}"

    def _make_primary(self) -> Element:
        if self.uri:
            return _make_from_desc(self._desc_for_uri(self.uri))
        return _make_from_desc(self.source)

    def _make_fallback(self) -> Element | None:
        if self.fallback_uri:
            return _make_from_desc(self._desc_for_uri(
                self.fallback_uri))
        if self.fallback_source:
            return _make_from_desc(self.fallback_source)
        if self.enable_dummy:
            # reference enable-dummy: synthesized signal
            return _make_from_desc(
                "videotestsrc pattern=black is-live=true")
        return None

    def start(self) -> bool:
        if not self.source and not self.uri:
            self.post_error("fallbacksrc: no source configured")
            return False
        self._blocked = bool(self.manual_unblock)
        self._primary = self._make_primary()
        self._fallback = self._make_fallback()
        if self.immediate_fallback and self._fallback is not None:
            # reference immediate-fallback: output the fallback until
            # the primary actually produces
            self._primary_failed_at = self._now()
            self._activate(self._fallback)
        else:
            self._activate(self._primary)
        return True

    def _activate(self, el: Element) -> None:
        if self._active is not None:
            for sp in self._active.src_pads():
                sp.unlink()
            self._active.set_state(State.NULL)
        el.clock = self.clock
        el.base_time = self.base_time
        el.bus = self.bus
        self._wire(el)
        el.set_state(State.PLAYING)
        self._active = el
        # drive the child's tasks from our supervision task so that
        # runtime failovers keep flowing without rewiring the scheduler
        self._child_tasks = []
        for t in el.iterate_tasks():
            t.prepare()
            t.start()
            self._child_tasks.append(t)
        self._last_buffer_time = self._now()
        self.stats["using_fallback"] = el is self._fallback
        self.emit("status-changed",
                  "fallback" if el is self._fallback else "primary")
        self.post_element_message(
            "fallbacksrc-status",
            using_fallback=self.stats["using_fallback"])

    def _fail_primary(self) -> None:
        self._primary_failed_at = self._now()
        if self._fallback is not None:
            self.stats["num_fallback_switches"] += 1
            self._activate(self._fallback)

    def stop(self) -> bool:
        for el in (self._primary, self._fallback):
            if el is not None:
                el.set_state(State.NULL)
        self._active = None
        return True

    # -- supervision ----------------------------------------------------
    def iterate_tasks(self):
        return (Task(f"{self.name}-supervise", self._supervise),)

    def _supervise(self) -> TaskResult:
        worked = False
        for t in list(getattr(self, "_child_tasks", [])):
            r = t.run_once()
            if r is TaskResult.CONTINUE:
                worked = True
        now = self._now()
        if self._active is self._primary \
                and self._last_buffer_time is not None \
                and now - self._last_buffer_time > self.timeout \
                and self._fallback is not None:
            self._fail_primary()
            return TaskResult.CONTINUE
        if self._active is self._fallback \
                and self._primary_failed_at is not None \
                and self.restart_timeout \
                and now - self._primary_failed_at > self.restart_timeout:
            if self._first_failed_at is None:
                self._first_failed_at = self._primary_failed_at
            if self.retry_timeout \
                    and now - self._first_failed_at > self.retry_timeout:
                # reference retry-timeout: stop retrying, stay on
                # the fallback for good
                self._primary_failed_at = None
                self.post_element_message("fallbacksrc-retry-exhausted")
                return TaskResult.CONTINUE
            # retry the primary
            self.stats["num_retry"] += 1
            self.stats["last_retry_time"] = now
            self._primary = self._make_primary()
            self._primary_failed_at = None
            self._activate(self._primary)
            return TaskResult.CONTINUE
        return TaskResult.CONTINUE if worked else TaskResult.IDLE
