"""gstpu-launch: build and run a pipeline from its textual
description (gst-launch-1.0 analogue; the reference's pipelines are
launched with GStreamer core's tool, the description syntax is the
one `gstpu.parse_launch` implements).

Usage:
    gstpu-launch [-q] [-m] "audiotestsrc num-buffers=100 ! fakesink"
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gstpu-launch")
    ap.add_argument("pipeline", nargs="+",
                    help="pipeline description (a ! b prop=v ! c)")
    ap.add_argument("-q", "--quiet", action="store_true")
    ap.add_argument("-m", "--messages", action="store_true",
                    help="print bus messages")
    args = ap.parse_args(argv)

    import gstpu
    gstpu.init()
    from gstpu import State, parse_launch

    desc = " ".join(args.pipeline)
    try:
        pipeline = parse_launch(desc)
    except Exception as e:
        print(f"ERROR: could not construct pipeline: {e}",
              file=sys.stderr)
        return 1

    if args.messages and pipeline.bus is not None:
        orig_post = pipeline.bus.post

        def tee_post(msg):
            print(f"[bus] {msg}", file=sys.stderr)
            return orig_post(msg)

        pipeline.bus.post = tee_post

    if not args.quiet:
        print("Setting pipeline to PLAYING ...", file=sys.stderr)
    t0 = time.monotonic()
    pipeline.set_state(State.PLAYING)
    try:
        pipeline.run()
    except KeyboardInterrupt:
        if not args.quiet:
            print("Interrupted; stopping.", file=sys.stderr)
    except RuntimeError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        pipeline.set_state(State.NULL)
        return 1
    finally:
        pipeline.set_state(State.NULL)
    if not args.quiet:
        dt = time.monotonic() - t0
        print(f"Execution ended after {dt:.3f} s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
