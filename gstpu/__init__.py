"""gstpu — a TPU-native streaming media-processing framework.

A from-scratch rebuild of the capability surface of gst-plugin-rs
(GStreamer Rust plugins, see /root/reference and SURVEY.md): elements,
pads, caps negotiation, properties, events/queries, a gst-launch
compatible pipeline language — with per-buffer DSP implemented as fused
JAX/Pallas kernels over device-resident batches instead of per-sample
CPU loops.

Layering (SURVEY.md §7):
  core/     — L1': Caps/Buffer/Event/Query/Element/Pad/Pipeline/parse
  runtime/  — L2': batched device runtime, cooperative scheduler
  ops/      — L3': JAX/Pallas kernel library
  elements/ — L4': the element library (audio/video/generic/net/mux/...)
  parallel/ — mesh + sharding for multi-chip stream/sequence parallelism
  utils/    — tracers, logging, config
"""

__version__ = "0.1.0"

from gstpu.core.caps import Caps, Structure, IntRange, FractionRange, AnyList
from gstpu.core.buffer import Buffer, BufferFlags
from gstpu.core.event import (
    Event, StreamStartEvent, CapsEvent, SegmentEvent, EosEvent, GapEvent,
    FlushStartEvent, FlushStopEvent, TagEvent, CustomEvent, Segment,
)
from gstpu.core.query import Query, LatencyQuery, CapsQuery, PositionQuery
from gstpu.core.element import (
    Element, Pad, PadTemplate, PadDirection, PadPresence, State,
    FlowReturn, FlowError, Bus, Message,
)
from gstpu.core.props import Property, Mutability
from gstpu.core.registry import register_element, element_factory, Rank, make
from gstpu.core.bin import Bin, Pipeline
from gstpu.core.parse import parse_launch
from gstpu.core.clock import ClockTime, SECOND, MSECOND, USECOND, NSECOND


def init():
    """Register all built-in elements (idempotent).

    Mirrors GStreamer plugin registration: every plugin crate in the
    reference calls gst::plugin_define! + Element::register at load
    (reference tutorial/src/lib.rs:21-48); we eagerly import the element
    packages which self-register via @register_element.
    """
    import gstpu.elements  # noqa: F401

    gstpu.elements.register_all()
