"""Port of the reference threadshare benchmarks
(generic/threadshare/examples/benchmark.rs + the standalone sink's
stats accounting, examples/standalone/sink/stats.rs:11-39): N
parallel UDP stream pipelines, throughput counted over a steady-state
window, per-buffer latency mean/sigma/min/max, comparing the
shared-context scheduler (ts-udpsrc, one epoll thread for all
streams) against thread-per-stream dispatch.

    python examples/threadshare_benchmark.py [n_streams] [seconds]
"""

from __future__ import annotations

import socket
import sys
import threading
import time

import gstpu

gstpu.init()
from gstpu import State, parse_launch
from gstpu.runtime.scheduler import Context

N_STREAMS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
WINDOW_S = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0


def run(context: str | None) -> tuple[int, int]:
    """-> (buffers received in the window, extra OS threads)."""
    if context:
        Context.release(context)
    threads_before = threading.active_count()
    pipes = []
    drivers: list[threading.Thread] = []
    stop_driving = False
    for _ in range(N_STREAMS):
        extra = (f"context={context} context-wait=10 "
                 if context else "")
        p = parse_launch(f"ts-udpsrc address=127.0.0.1 port=0 "
                         f"{extra}! fakesink name=sink")
        p.set_state(State.PLAYING)
        pipes.append(p)
        if not context:
            # the comparison baseline: one OS thread per stream
            # (GStreamer's default source streaming-thread model)
            tasks = [t for el in p.iterate_elements()
                     for t in el.iterate_tasks()]

            def drive(tasks=tasks):
                while not stop_driving:
                    for t in tasks:
                        t.iterate()
                    time.sleep(0.0005)

            th = threading.Thread(target=drive, daemon=True)
            th.start()
            drivers.append(th)
    extra_threads = threading.active_count() - threads_before

    ports = []
    for p in pipes:
        for el in p.iterate_elements():
            if getattr(el, "bound_port", 0):
                ports.append(el.bound_port)
                break
    sinks = [p.get_by_name("sink") for p in pipes]
    # latency accounting (stats.rs): sender stamps monotonic ns in
    # the payload; a pad probe measures arrival latency
    latencies: list[int] = []
    lat_lock = threading.Lock()

    def probe(pad, item):
        from gstpu.core.buffer import Buffer as _B
        if isinstance(item, _B):
            t = int.from_bytes(item.to_bytes()[:8], "big")
            with lat_lock:
                latencies.append(time.monotonic_ns() - t)
        return "ok"

    for p in pipes:
        p.get_by_name("sink").static_pad("sink").add_probe(probe)

    stop = False

    def blast():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        k = 0
        pad = b"x" * 180
        while not stop:
            for port in ports:
                stamp = time.monotonic_ns().to_bytes(8, "big")
                tx.sendto(stamp + pad, ("127.0.0.1", port))
            k += 1
            if k % 50 == 0:
                time.sleep(0.001)     # let the receivers breathe
        tx.close()

    tx_thread = threading.Thread(target=blast, daemon=True)
    start_counts = [s.rendered for s in sinks]
    tx_thread.start()
    time.sleep(WINDOW_S)
    stop = True
    tx_thread.join()
    got = sum(s.rendered - c for s, c in zip(sinks, start_counts))
    with lat_lock:
        lat = list(latencies)
    if lat:
        import statistics
        ms = 1_000_000
        print(f"    latency: mean {statistics.mean(lat)/ms:7.2f} ms  "
              f"sigma {statistics.pstdev(lat)/ms:6.2f}  "
              f"min {min(lat)/ms:6.2f}  max {max(lat)/ms:7.2f}  "
              f"({len(lat)} samples)")
    stop_driving = True
    for th in drivers:
        th.join(timeout=1)
    for p in pipes:
        p.set_state(State.NULL)
    if context:
        Context.release(context)
    return got, extra_threads


def main() -> None:
    print(f"{N_STREAMS} UDP stream pipelines, {WINDOW_S:.0f}s window")
    shared, threads_shared = run("bench-ctx")
    print(f"shared context : {shared:8d} buffers "
          f"({shared / WINDOW_S:,.0f}/s) on {threads_shared} "
          f"extra OS thread(s)")
    per, threads_per = run(None)
    print(f"per-stream     : {per:8d} buffers "
          f"({per / WINDOW_S:,.0f}/s) on {threads_per} "
          f"extra OS thread(s)")


if __name__ == "__main__":
    main()
