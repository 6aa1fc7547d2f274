"""analyticscombiner / analyticssplitter / yoloxtensordec.

Rebuilds the reference analytics/analytics crate: N streams batched
into meta-carried mini-batches and back (the TPU batching primitive at
the element level), and tensor-output decoding into
AnalyticsRelationMeta object detections.
"""

from __future__ import annotations

import numpy as np

from gstpu.core.base import Aggregator, BaseTransform
from gstpu.core.buffer import Buffer, Meta
from gstpu.core.caps import Caps
from gstpu.core.element import (Element, FlowReturn, Pad, PadDirection,
                                PadPresence, PadTemplate)
from gstpu.core.event import (CapsEvent, EosEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element
from gstpu.core.video import video_caps
from gstpu.ops.detection import Detection, yolox_decode


class AnalyticsRelationMeta(Meta):
    """Object-detection/classification relations on a buffer
    (gst-analytics AnalyticsRelationMeta analogue)."""

    def __init__(self, detections: list[Detection] | None = None):
        self.detections = detections or []


class AnalyticsBatchMeta(Meta):
    """A mini-batch of per-stream buffers carried on one buffer
    (reference analyticscombiner output)."""

    def __init__(self, streams: list[tuple[str, Buffer, Caps | None]]):
        self.streams = streams  # (stream_name, buffer, caps)


@register_element("analyticscombiner", Rank.NONE)
class AnalyticsCombiner(Aggregator):
    """Batches one buffer per sink pad into a single buffer carrying
    AnalyticsBatchMeta (N streams -> device mini-batch)."""

    PAD_TEMPLATES = [
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    Caps.new("multistream/x-analytics-batch")),
        PadTemplate("sink_%u", PadDirection.SINK, PadPresence.REQUEST,
                    Caps.any()),
    ]

    def negotiate_src_caps(self) -> Caps:
        return Caps.new("multistream/x-analytics-batch")

    def aggregate(self, timeout: bool) -> FlowReturn:
        pads = self.agg_sink_pads()
        if not all(p.queue or p.pad_eos for p in pads):
            return FlowReturn.OK
        streams = []
        pts = None
        for p in pads:
            buf = p.pop_buffer()
            if buf is None:
                continue
            streams.append((p.name, buf, p.current_caps))
            if pts is None or (buf.pts or 0) < pts:
                pts = buf.pts or 0
        if not streams:
            return FlowReturn.OK
        out = Buffer(b"", pts=pts)
        out.add_meta(AnalyticsBatchMeta(streams))
        return self.srcpad.push(out)


@register_element("analyticssplitter", Rank.NONE)
class AnalyticsSplitter(Element):
    """Splits AnalyticsBatchMeta batches back into per-stream pads
    (created on demand, named after the combiner's pads)."""

    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    Caps.new("multistream/x-analytics-batch")),
        PadTemplate("src_%u", PadDirection.SRC, PadPresence.SOMETIMES,
                    Caps.any()),
    ]

    SIGNALS = ("pad-added",)

    def __init__(self, name=None):
        super().__init__(name)
        self.sinkpad = self.static_pad("sink")
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = self._event
        self._srcs: dict[str, Pad] = {}

    def _get_src(self, stream_name: str, caps: Caps | None) -> Pad:
        pad = self._srcs.get(stream_name)
        if pad is None:
            pad = Pad(f"src_{stream_name}", PadDirection.SRC,
                      self.PAD_TEMPLATES[1], self)
            self.add_pad(pad)
            self._srcs[stream_name] = pad
            self.emit("pad-added", pad)
            pad.push_event(StreamStartEvent(f"{self.name}/{stream_name}"))
            if caps is not None:
                pad.push_event(CapsEvent(caps))
            pad.push_event(SegmentEvent(Segment()))
        return pad

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        meta = buf.get_meta(AnalyticsBatchMeta)
        if meta is None:
            return FlowReturn.OK
        for stream_name, sbuf, caps in meta.streams:
            src = self._get_src(stream_name, caps)
            ret = src.push(sbuf)
            if not ret.is_ok and ret is not FlowReturn.NOT_LINKED:
                return ret
        return FlowReturn.OK

    def _event(self, pad, ev) -> bool:
        if isinstance(ev, EosEvent):
            for p in self._srcs.values():
                p.push_event(EosEvent())
            return True
        return True


@register_element("yoloxtensordec", Rank.NONE)
class YoloxTensorDec(BaseTransform):
    """Decodes raw YOLOX head tensors into AnalyticsRelationMeta
    detections (reference yoloxtensordec: box decode + NMS)."""

    IN_PLACE = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    Caps(list(Caps.new("application/x-tensor",
                                       type="yolox"))
                         + list(video_caps()))),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    Caps(list(Caps.new("application/x-tensor",
                                       type="yolox"))
                         + list(video_caps()))),
    ]

    score_threshold = Property(float, default=0.3, minimum=0.0,
                               maximum=1.0, mutable=Mutability.PLAYING)
    nms_threshold = Property(float, default=0.45, minimum=0.0,
                             maximum=1.0, mutable=Mutability.PLAYING)
    image_width = Property(int, default=640, minimum=32,
                           mutable=Mutability.READY)
    image_height = Property(int, default=640, minimum=32,
                            mutable=Mutability.READY)
    num_classes = Property(int, default=80, minimum=1,
                           mutable=Mutability.READY)

    def transform_ip(self, buf: Buffer) -> None:
        tm = buf.get_meta(TensorMeta)
        if tm is not None:
            # video buffer carrying inference output (yoloxinference)
            arr = np.asarray(tm.data).reshape(-1,
                                              5 + self.num_classes)
            from gstpu.core.video import VideoInfo
            info = VideoInfo.from_caps(self.in_caps)
            w, h = info.width, info.height
        else:
            arr = buf.array.view(np.float32) \
                .reshape(-1, 5 + self.num_classes)
            w, h = self.image_width, self.image_height
        dets = yolox_decode(arr, w, h,
                            self.score_threshold, self.nms_threshold)
        buf.add_meta(AnalyticsRelationMeta(dets))


class TensorMeta(Meta):
    """Raw inference output attached to a media buffer (gst analytics
    TensorMeta analogue; reference burn-yoloxinference attaches its
    output this way)."""

    def __init__(self, data: np.ndarray, tensor_type: str = "yolox"):
        self.data = data
        self.tensor_type = tensor_type

    def copy(self):
        return TensorMeta(self.data, self.tensor_type)


@register_element("yoloxinference", Rank.NONE)
class YoloxInference(BaseTransform):
    """Runs the JAX YOLOX forward (gstpu/ops/yolox.py) on RGB frames
    and attaches the (A, 5+C) output as TensorMeta (reference
    analytics/burn/src/yoloxinference; the burn/wgpu compute becomes
    a jitted TPU graph here).  Input frames must already be scaled to
    a multiple of 32 (like the reference's videoconvertscale step)."""

    IN_PLACE = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    video_caps(formats=("RGB", "RGBA"))),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    video_caps(formats=("RGB", "RGBA"))),
    ]

    model_file = Property(str, default=None, mutable=Mutability.READY,
                          blurb=".npz weights (random init if unset)")
    num_classes = Property(int, default=80, minimum=1,
                           mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self._params = None

    def start(self) -> bool:
        from gstpu.ops import yolox
        if self.model_file:
            self._params = yolox.load_params(self.model_file)
        else:
            self._params = yolox.init_params(self.num_classes)
        return True

    def transform_ip(self, buf: Buffer) -> None:
        import jax.numpy as jnp

        from gstpu.core.video import VideoInfo
        from gstpu.ops.yolox import yolox_forward
        info = VideoInfo.from_caps(self.in_caps)
        frame = info.view(buf)[..., :3].astype(np.float32) / 255.0
        pred = np.asarray(yolox_forward(self._params,
                                        jnp.asarray(frame)))
        buf.add_meta(TensorMeta(pred))
