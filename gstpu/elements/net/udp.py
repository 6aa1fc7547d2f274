"""udpsrc / udpsink: socket elements (reference net/udp rsudp +
threadshare ts-udpsrc/sink). Non-blocking sockets polled from the
cooperative scheduler loop — the threadshare model without per-element
threads."""

from __future__ import annotations

import socket

from gstpu.core.base import BaseSink, PushSrc
from gstpu.core.buffer import Buffer, NetAddressMeta
from gstpu.core.caps import Caps
from gstpu.core.element import (FlowError, FlowReturn, PadDirection,
                                PadPresence, PadTemplate)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element


@register_element("udpsrc", Rank.NONE)
class UdpSrc(PushSrc):
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC,
                                 PadPresence.ALWAYS, Caps.any())]

    address = Property(str, default="0.0.0.0", mutable=Mutability.READY)
    port = Property(int, default=5004, minimum=0, maximum=65535,
                    mutable=Mutability.READY)
    caps = Property(Caps, default=None, mutable=Mutability.READY)
    buffer_size = Property(int, default=65536, minimum=1)
    context = Property(str, default=None, mutable=Mutability.READY,
                       blurb="Shared scheduling context: elements with "
                             "the same name run epoll-driven on ONE "
                             "context thread (ts-udpsrc semantics, "
                             "threadshare runtime/mod.rs)")
    context_wait = Property(int, default=0, minimum=0, maximum=1000,
                            mutable=Mutability.READY,
                            blurb="Context throttle period (ms)")

    def __init__(self, name=None):
        super().__init__(name)
        self._sock: socket.socket | None = None
        self._rx_queue = __import__("collections").deque()
        self.is_live = True

    def iterate_tasks(self):
        tasks = super().iterate_tasks()
        if self.context and tasks and self._sock is not None:
            t = tasks[0]
            t.context_name = self.context
            t.context_wait = self.context_wait / 1000.0
            t.watch_sock = self._sock
        return tasks

    def start(self) -> bool:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        if self.port != 0:
            # REUSEADDR on an ephemeral bind lets the kernel hand the
            # SAME port to two sockets (datagrams then reach only one)
            self._sock.setsockopt(socket.SOL_SOCKET,
                                  socket.SO_REUSEADDR, 1)
        self._sock.bind((self.address, self.port))
        self._sock.setblocking(False)
        return True

    @property
    def bound_port(self) -> int:
        return self._sock.getsockname()[1] if self._sock else 0

    def stop(self) -> bool:
        if self._sock:
            self._sock.close()
            self._sock = None
        return True

    def negotiate(self) -> Caps:
        return self.caps if self.caps is not None \
            else Caps.new("application/octet-stream")

    def create(self) -> Buffer | None:
        # drain a whole batch per wakeup through the native
        # recvmmsg path (media plane in C++, SURVEY §2.9); queued
        # packets are handed out one per create()
        if not self._rx_queue:
            from gstpu.native_net import recv_batch
            stride = min(self.buffer_size, 65536)
            msgs = max(1, min(64, 131072 // stride))
            self._rx_queue.extend(
                recv_batch(self._sock, msgs, stride))
        if not self._rx_queue:
            raise FlowError(FlowReturn.FLUSHING, "no datagram")
        data, addr = self._rx_queue.popleft()
        buf = Buffer(data)
        if self.clock is not None:
            buf.pts = self.running_time()
        buf.add_meta(NetAddressMeta(addr))
        return buf


@register_element("udpsink", Rank.NONE)
class UdpSink(BaseSink):
    PAD_TEMPLATES = [PadTemplate("sink", PadDirection.SINK,
                                 PadPresence.ALWAYS, Caps.any())]

    host = Property(str, default="127.0.0.1", mutable=Mutability.PLAYING)
    port = Property(int, default=5004, minimum=0, maximum=65535,
                    mutable=Mutability.PLAYING)

    def __init__(self, name=None):
        super().__init__(name)
        self._sock: socket.socket | None = None
        self.sent = 0

    def start(self) -> bool:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        return True

    def stop(self) -> bool:
        if self._sock:
            self._sock.close()
            self._sock = None
        return True

    def render(self, buf: Buffer):
        self._sock.sendto(buf.to_bytes(), (self.host, self.port))
        self.sent += 1
        return FlowReturn.OK
