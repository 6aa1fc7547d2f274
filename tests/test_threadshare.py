"""Threadshare runtime: reactor, timers, shared context threads
(VERDICT r1 #6).  The headline gate is the 500-stream ts-udpsrc soak
(port of generic/threadshare/examples/benchmark.rs): 500 socket
sources share ONE epoll-driven context thread — thread count stays
O(contexts), every packet is delivered, no busy polling."""

import socket
import threading
import time

import pytest

from gstpu import State, parse_launch
from gstpu.runtime.reactor import Reactor
from gstpu.runtime.scheduler import Context


def _wait_for(cond, timeout=15.0, step=0.01):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(step)
    return False


# ---------------------------------------------------------------------------
# reactor unit tests
# ---------------------------------------------------------------------------

def test_reactor_timers_oneshot_interval_cancel():
    r = Reactor()
    fired = []
    r.add_timer(0.01, lambda: fired.append("one"))
    iv = r.add_timer(0.01, lambda: fired.append("tick"), interval=0.01)
    t0 = time.monotonic()
    while time.monotonic() - t0 < 0.06:
        r.poll(0.02)
    iv.cancel()
    n = fired.count("tick")
    assert fired.count("one") == 1
    assert n >= 3
    for _ in range(3):
        r.poll(0.02)
    assert fired.count("tick") == n     # cancelled: no more ticks
    r.close()


def test_reactor_io_wakeup():
    r = Reactor()
    a, b = socket.socketpair()
    a.setblocking(False)
    got = []
    r.register_read(a, lambda: got.append(a.recv(100)))
    assert r.poll(0.01) is False        # nothing readable
    b.send(b"ping")
    assert _wait_for(lambda: r.poll(0.05) or got)
    assert got == [b"ping"]
    r.unregister(a)
    a.close()
    b.close()
    r.close()


# ---------------------------------------------------------------------------
# ts-udpsrc soak: 500 streams, one context thread
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_streams,n_packets", [(500, 5)])
def test_ts_udpsrc_500_streams_one_thread(n_streams, n_packets):
    Context.release("io-soak")
    threads_before = threading.active_count()

    pipes = []
    for i in range(n_streams):
        p = parse_launch(
            "ts-udpsrc address=127.0.0.1 port=0 context=io-soak "
            "context-wait=10 ! appsink name=sink")
        p.set_state(State.PLAYING)
        pipes.append(p)

    # exactly ONE new OS thread for 500 socket sources
    assert threading.active_count() <= threads_before + 1

    ports = []
    for p in pipes:
        src = next(iter(p.iterate_elements()))
        # find the udpsrc element
        for el in p.iterate_elements():
            if hasattr(el, "bound_port") and el.bound_port:
                src = el
                break
        ports.append(src.bound_port)
    assert all(ports)

    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for k in range(n_packets):
        for i, port in enumerate(ports):
            tx.sendto(f"pkt-{i}-{k}".encode(), ("127.0.0.1", port))
    tx.close()

    sinks = [p.get_by_name("sink") for p in pipes]

    def all_arrived():
        return all(len(s.samples) >= n_packets for s in sinks)

    assert _wait_for(all_arrived, timeout=30.0), (
        sorted(len(s.samples) for s in sinks)[:10])
    assert threading.active_count() <= threads_before + 1

    # payload integrity on a few streams
    for i in (0, n_streams // 2, n_streams - 1):
        got = sorted(b.to_bytes() for b in sinks[i].pull_all())
        assert got == sorted(f"pkt-{i}-{k}".encode()
                             for k in range(n_packets))
    for p in pipes:
        p.set_state(State.NULL)
    Context.release("io-soak")


def test_ts_udpsrc_live_latency():
    """Live path: a packet sent to an idle epoll-parked context must
    reach the appsink without anyone calling run() — and fast."""
    Context.release("io-live")
    p = parse_launch("ts-udpsrc address=127.0.0.1 port=0 "
                     "context=io-live ! appsink name=sink")
    p.set_state(State.PLAYING)
    src = next(el for el in p.iterate_elements()
               if hasattr(el, "bound_port"))
    sink = p.get_by_name("sink")
    time.sleep(0.05)                    # let the thread park in epoll
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    t0 = time.monotonic()
    tx.sendto(b"live", ("127.0.0.1", src.bound_port))
    assert _wait_for(lambda: len(sink.samples) > 0, timeout=2.0)
    latency = time.monotonic() - t0
    tx.close()
    assert sink.pull_all()[0].to_bytes() == b"live"
    # epoll wakeup, not a sleep(poll-period) loop: well under 100 ms
    assert latency < 0.1, latency
    p.set_state(State.NULL)
    Context.release("io-live")


def test_context_timer_api():
    """Elements can arm timers on their context (aggregator timeouts,
    RTCP schedules, livesync)."""
    Context.release("io-timer")
    ctx = Context.acquire("io-timer", threaded=True)
    fired = threading.Event()
    ctx.add_timer(0.02, fired.set)
    # the context thread only exists once a task is added; arm one
    from gstpu.runtime.scheduler import Task, TaskResult
    ctx.add_task(Task("idle", lambda: TaskResult.IDLE))
    assert fired.wait(2.0)
    Context.release("io-timer")


def test_blocking_adapter_decouples_blocking_sink():
    """ts-blocking-adapter: a slow/blocking downstream must not stall
    the upstream chain call (reference threadshare
    tests/blocking_adapter.rs)."""
    from gstpu import Buffer
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make

    adapter = make("ts-blocking-adapter")
    h = Harness(adapter)

    done: list[bytes] = []
    orig = h.sinkpad.chain_function

    def slow_chain(pad, buf):
        time.sleep(0.02)               # downstream blocks (clock sync)
        done.append(buf.to_bytes())
        return orig(pad, buf)

    h.sinkpad.chain_function = slow_chain
    h.set_caps("application/x-test")

    # the first push hands off instantly: the src thread absorbs the
    # sink's 20ms service time
    t0 = time.monotonic()
    h.push(Buffer(b"a"))
    first_push = time.monotonic() - t0
    assert first_push < 0.015

    for i in range(4):
        h.push(Buffer(bytes([i])))

    deadline = time.monotonic() + 5
    while len(done) < 5 and time.monotonic() < deadline:
        time.sleep(0.005)
    assert done == [b"a", b"\x00", b"\x01", b"\x02", b"\x03"]

    from gstpu.core.event import EosEvent
    h.push_event(EosEvent())
    h.teardown()


def test_udpsrc_multicast_loopback_and_knobs():
    """Round-5 knobs: auto-multicast joins the group (loopback on
    127/lo), skip-first-bytes strips a prefix, uri configures
    address+port."""
    import socket as _socket
    import time as _time

    from gstpu.core.registry import make
    group = "239.255.42.42"
    src = make("udpsrc", uri=f"udp://{group}:0", skip_first_bytes=4)
    # port 0 via uri -> ephemeral; bind + join happen at start
    assert src.set_state(State.READY)
    port = src.bound_port
    assert port > 0 and src.address == group
    src.set_state(State.PLAYING)

    tx = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    tx.setsockopt(_socket.IPPROTO_IP, _socket.IP_MULTICAST_TTL, 1)
    tx.setsockopt(_socket.IPPROTO_IP, _socket.IP_MULTICAST_LOOP, 1)
    got = []
    deadline = _time.monotonic() + 5
    while not got and _time.monotonic() < deadline:
        tx.sendto(b"HDR!payload", (group, port))
        try:
            got.append(src.create())
        except Exception:
            _time.sleep(0.01)
    tx.close()
    src.set_state(State.NULL)
    assert got and got[0].to_bytes() == b"payload"
