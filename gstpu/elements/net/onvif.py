"""onvifmetadatapay / onvifmetadatadepay: ONVIF XML metadata over RTP
(reference net/onvif: VND.ONVIF.METADATA payload; XML documents may
span packets, the RTP marker closes a document)."""

from __future__ import annotations

from gstpu.core.buffer import Buffer, Meta
from gstpu.core.caps import Caps
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.registry import Rank, register_element
from gstpu.net.rtp.basepay import RtpBaseDepay2, RtpBasePay2, rtp_caps
from gstpu.net.rtp.packet import RtpPacket


class OnvifXMLFrameMeta(Meta):
    """Marks buffers carrying one complete ONVIF XML document
    (reference net/onvif/src/lib.rs:129)."""

    def __init__(self, complete: bool = True):
        self.complete = complete


ONVIF_META_CAPS = Caps.new("application/x-onvif-metadata",
                           encoding="utf8")


def _tmpl(name, d, caps):
    return PadTemplate(name, d, PadPresence.ALWAYS, caps)


@register_element("onvifmetadatapay", Rank.PRIMARY)
class OnvifMetadataPay(RtpBasePay2):
    PAD_TEMPLATES = [
        _tmpl("sink", PadDirection.SINK, ONVIF_META_CAPS.copy()),
        _tmpl("src", PadDirection.SRC,
              rtp_caps("VND.ONVIF.METADATA", clock_rate=90000,
                       media="application")),
    ]


@register_element("onvifmetadatadepay", Rank.PRIMARY)
class OnvifMetadataDepay(RtpBaseDepay2):
    PAD_TEMPLATES = [
        _tmpl("sink", PadDirection.SINK,
              rtp_caps("VND.ONVIF.METADATA", clock_rate=90000,
                       media="application")),
        _tmpl("src", PadDirection.SRC, ONVIF_META_CAPS.copy()),
    ]

    def __init__(self, name=None):
        super().__init__(name)
        self._frags: list[bytes] = []
        self._doc_pts = None

    def depay_src_caps(self, incaps):
        return ONVIF_META_CAPS.copy()

    def handle_packet(self, pkt: RtpPacket, buf: Buffer) -> None:
        if not self._frags:
            self._doc_pts = self.pts_for(pkt)
        self._frags.append(pkt.payload)
        if pkt.marker:
            doc = b"".join(self._frags)
            self._frags = []
            self.queue_buffer(doc, pts=self._doc_pts)
            self._pending[-1].add_meta(OnvifXMLFrameMeta(True))
