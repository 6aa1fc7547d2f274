"""Segment a live-style stream into an HLS (CMAF) playlist."""

import sys

import gstpu

gstpu.init()
from gstpu import State, parse_launch

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gstpu-hls"
import os

os.makedirs(root, exist_ok=True)
p = parse_launch(
    "videotestsrc num-buffers=90 ! video/x-raw, width=320, "
    "height=240, framerate=30/1 ! cmafmux fragment-duration=1000000000 "
    f"! hlscmafsink playlist_location={root}/stream.m3u8 "
    f"init_location={root}/init.mp4 location={root}/seg%05d.m4s")
p.set_state(State.PLAYING)
p.run()
p.set_state(State.NULL)
print(f"wrote {root}/stream.m3u8:")
print(open(f"{root}/stream.m3u8").read())
