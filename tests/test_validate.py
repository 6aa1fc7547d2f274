"""gst-validate analogue (gstpu.utils.validate) + new tracers.

Mirrors the reference utils/validate plugin's shape: scenario text ->
timed actions -> reports, including the custom
check-last-frame-qrcode action (QR decoding pluggable; env-gated)."""

import hashlib
import json

import numpy as np
import pytest

from gstpu import State, parse_launch
from gstpu.utils import validate as V


def test_parse_scenario():
    acts = V.parse_scenario('''
# comment
description, summary="sanity check", seek=false
wait, duration=0.5
check-last-sample, sink-name=sink, checksum=abc
''')
    assert [a.name for a in acts] == ["description", "wait",
                                      "check-last-sample"]
    assert acts[0].fields["summary"] == "sanity check"
    assert acts[0].fields["seek"] is False
    assert acts[1].fields["duration"] == 0.5


def test_scenario_check_last_sample():
    p = parse_launch("audiotestsrc num-buffers=4 samplesperbuffer=64 "
                     "! appsink name=sink")
    p.set_state(State.PLAYING)
    p.run()
    sink = p.get_by_name("sink")
    want = hashlib.sha256(sink.samples[-1].to_bytes()).hexdigest()
    runner = V.ScenarioRunner(p, f'''
description, summary="post-run checks"
check-last-sample, sink-name=sink, checksum={want}
stop
''')
    assert runner.run(), runner.reports
    assert [r.level for r in runner.reports] == ["ok", "ok", "ok"]


def test_scenario_checksum_mismatch_reports_error():
    p = parse_launch("audiotestsrc num-buffers=2 ! appsink name=sink")
    p.set_state(State.PLAYING)
    p.run()
    runner = V.ScenarioRunner(p, "check-last-sample, sink-name=sink, "
                                 "checksum=deadbeef")
    assert not runner.run()
    assert runner.reports[0].level == "error"
    assert "checksum" in runner.reports[0].message


def test_scenario_unknown_action():
    p = parse_launch("audiotestsrc num-buffers=1 ! appsink name=sink")
    runner = V.ScenarioRunner(p, "frob-the-widgets, hard=true")
    assert not runner.run()
    assert "unknown action" in runner.reports[0].message


def test_scenario_eos_and_position():
    p = parse_launch("audiotestsrc num-buffers=10 samplesperbuffer=441 "
                     "! appsink name=sink")
    runner = V.ScenarioRunner(p, '''
set-state, state=playing
eos
check-position, expected-position=0.09, tolerance=0.02
stop
''')
    assert runner.run(), [r.message for r in runner.reports]


def test_check_last_frame_qrcode_env_gated_skip():
    p = parse_launch("videotestsrc num-buffers=1 ! appsink name=sink")
    p.set_state(State.PLAYING)
    p.run()
    V.QR_DECODER = None
    runner = V.ScenarioRunner(
        p, "check-last-frame-qrcode, sink-name=sink")
    assert runner.run()   # skipped, not failed
    assert runner.reports[0].level == "skipped"


def test_check_last_frame_qrcode_with_injected_decoder():
    p = parse_launch("videotestsrc num-buffers=1 ! capsfilter caps="
                     "\"video/x-raw, format=RGB, width=16, height=16\""
                     " ! appsink name=sink")
    p.set_state(State.PLAYING)
    p.run()
    payload = json.dumps({"TIMESTAMP": 42, "name": "cam1"})
    V.QR_DECODER = lambda frame: [payload]
    try:
        runner = V.ScenarioRunner(p, '''
check-last-frame-qrcode, sink-name=sink, expected-fields="{\\"TIMESTAMP\\": 42}"
''')
        ok = runner.run()
        assert ok, [r.message for r in runner.reports]
        # wrong expectation fails
        runner2 = V.ScenarioRunner(p, '''
check-last-frame-qrcode, sink-name=sink, expected-fields="{\\"TIMESTAMP\\": 7}"
''')
        assert not runner2.run()
    finally:
        V.QR_DECODER = None


def test_fmt_tracer(caplog):
    import logging
    from gstpu.utils.tracing import FmtTracer
    t = FmtTracer(level="INFO")
    t.install()
    try:
        with caplog.at_level(logging.INFO, logger="gstpu.trace"):
            p = parse_launch("audiotestsrc num-buffers=2 ! "
                             "appsink name=sink")
            p.set_state(State.PLAYING)
            p.run()
        assert any("pad_push" in r.message for r in caplog.records)
    finally:
        t.uninstall()


def test_jax_profiler_tracer(tmp_path):
    from gstpu.utils.tracing import JaxProfilerTracer
    t = JaxProfilerTracer(logdir=str(tmp_path / "trace"))
    t.install()
    try:
        p = parse_launch("audiotestsrc num-buffers=2 ! rsaudioecho "
                         "delay=1000000 ! appsink name=sink")
        p.set_state(State.PLAYING)
        p.run()
    finally:
        t.flush()
        t.uninstall()
    # an xplane trace landed in the logdir
    import glob
    files = glob.glob(str(tmp_path / "trace" / "**" / "*"),
                      recursive=True)
    assert any("xplane" in f or f.endswith(".trace.json.gz")
               for f in files), files
