"""The flagship audio chain (BASELINE configs #1/#2): echo ->
loudness normalization -> EBU R128 meter, via the pipeline language."""

import gstpu

gstpu.init()
from gstpu import State, parse_launch

p = parse_launch(
    "audiotestsrc num-buffers=1200 "
    "! audio/x-raw, format=F64LE, rate=192000, channels=2 "
    "! rsaudioecho delay=100000000 intensity=0.3 "
    "! audioloudnorm ! ebur128level name=meter ! appsink name=out")
p.set_state(State.PLAYING)
p.run()
out = p.get_by_name("out")
msgs = []
while (m := p.bus.pop()) is not None:
    if getattr(m, "name", "") == "ebur128-level":
        msgs.append(m)
if msgs:
    print("last report:", dict(msgs[-1].fields))
print(f"{len(out.pull_all())} buffers through the chain; "
      f"{len(msgs)} loudness reports on the bus")
p.set_state(State.NULL)
