"""Stream buffers over a real QUIC v1 connection on localhost."""

import threading
import time

import gstpu

gstpu.init()
from gstpu import State, parse_launch
from gstpu.core.registry import make

src = make("quinnquicsrc")
src.port = 0
src.set_state(State.READY)
port = src.bound_port

send = parse_launch(f"audiotestsrc num-buffers=50 ! quinnquicsink "
                    f"name=qs address=127.0.0.1 port={port}")
qs = send.get_by_name("qs")
qs.certificate_fingerprint = src.local_fingerprint

recv = parse_launch("appsink name=out")
out = recv.get_by_name("out")
src.pads["src"].link(out.pads["sink"])
src.set_state(State.PLAYING)
out.set_state(State.PLAYING)

stop = False


def drive():
    while not stop:
        for t in src.iterate_tasks():
            t.iterate()
        time.sleep(0.001)


th = threading.Thread(target=drive, daemon=True)
th.start()
send.set_state(State.PLAYING)
send.run()
deadline = time.monotonic() + 5
while len(out.samples) < 50 and time.monotonic() < deadline:
    time.sleep(0.01)
stop = True
th.join()
print(f"received {len(out.samples)} buffers "
      f"({sum(len(b.to_bytes()) for b in out.samples)} bytes) "
      "over QUIC")
send.set_state(State.NULL)
src.set_state(State.NULL)
