"""viuersink, compositor/skiacompositor, llamatexttransform tests."""

import numpy as np
import pytest

from gstpu import Buffer, Caps, State, parse_launch
from gstpu.core.caps import parse_caps
from gstpu.core.element import Pad, PadDirection, PadPresence, PadTemplate
from gstpu.core.event import (CapsEvent, EosEvent, Segment,
                              SegmentEvent, StreamStartEvent)
from gstpu.core.registry import make
from gstpu.core.video import VideoInfo

SECOND = 10**9


def test_viuersink_ansi_halfblocks(tmp_path):
    out = tmp_path / "term.txt"
    p = parse_launch(
        'videotestsrc num-buffers=1 ! capsfilter caps="video/x-raw, '
        'format=RGB, width=16, height=8" ! '
        f'viuersink width=16 file={out}')
    p.set_state(State.PLAYING)
    p.run()
    p.set_state(State.NULL)
    text = out.read_text()
    # truecolor fg/bg + upper-half-block cells
    assert "\x1b[38;2;" in text and "\x1b[48;2;" in text
    assert "▀" in text
    lines = [ln for ln in text.splitlines() if ln]
    assert len(lines) == 4           # 8 rows -> 4 cell lines
    assert lines[0].count("▀") == 16


def test_viuersink_render_golden():
    from gstpu.elements.video.viuer import render_ansi_halfblocks
    img = np.zeros((2, 1, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    img[1, 0] = (0, 0, 255)
    s = render_ansi_halfblocks(img)
    assert s == ("\x1b[38;2;255;0;0m\x1b[48;2;0;0;255m▀"
                 "\x1b[0m\n")


def _feed(pad, caps):
    f = Pad("f", PadDirection.SRC,
            PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                        Caps.any()))
    f.link(pad)
    f.push_event(StreamStartEvent("s"))
    f.push_event(CapsEvent(parse_caps(caps)))
    f.push_event(SegmentEvent(Segment()))
    return f


def test_compositor_places_and_blends():
    comp = make("compositor", width=32, height=16)
    out = []
    import gstpu
    cap = Pad("cap", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (out.append(b)
                                       or gstpu.FlowReturn.OK)
    cap.event_function = lambda p, e: True
    comp.static_pad("src").link(cap)
    comp.set_state(State.PLAYING)
    p0 = comp.request_pad()
    p1 = comp.request_pad()
    p1.xpos, p1.ypos, p1.alpha = 4, 4, 0.5
    f0 = _feed(p0, "video/x-raw, format=RGB, width=8, height=8")
    f1 = _feed(p1, "video/x-raw, format=RGB, width=8, height=8")
    red = np.zeros((8, 8, 3), np.uint8); red[..., 0] = 200
    blue = np.zeros((8, 8, 3), np.uint8); blue[..., 2] = 200
    vi = VideoInfo("RGB", 8, 8)
    f0.push(vi.make_buffer(red, pts=0))
    f1.push(vi.make_buffer(blue, pts=0))
    f0.push_event(EosEvent())
    f1.push_event(EosEvent())
    assert out
    oi = VideoInfo("RGB", 32, 16)
    frame = oi.view(out[0])
    # layer 0 at origin: red
    assert tuple(frame[0, 0]) == (200, 0, 0)
    # background (black) outside the layers
    assert tuple(frame[15, 31]) == (0, 0, 0)
    # overlap region (4..7, 4..7): blue at alpha 0.5 over red
    r, g, b = frame[5, 5]
    assert r == 100 and b == 100        # 200*(1-0.5), 200*0.5
    # non-overlap part of layer 1: blue at 0.5 over black
    assert tuple(frame[10, 10]) == (0, 0, 100)
    comp.set_state(State.NULL)


def test_skiacompositor_alias():
    el = make("skiacompositor")
    assert type(el).__name__ == "SkiaCompositor"


def test_llamatexttransform_with_injected_engine():
    p = parse_launch('appsrc name=src caps="text/x-raw, format=utf8" '
                     '! llamatexttransform name=lm ! appsink name=out')
    lm = p.get_by_name("lm")
    prompts = []

    def engine(prompt):
        prompts.append(prompt)
        return "REPLY" + str(len(prompts))
    lm.engine = engine
    lm.system_prompt = "You are a captioner."
    src, out = p.get_by_name("src"), p.get_by_name("out")
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(b"hello", pts=0, duration=SECOND))
    src.push_buffer(Buffer(b"again", pts=SECOND, duration=SECOND))
    src.end_of_stream()
    p.run()
    bufs = out.pull_all()
    assert [b.to_bytes().decode() for b in bufs] == \
        ["REPLY1", "REPLY2"]
    assert bufs[0].pts == 0 and bufs[1].pts == SECOND
    # the second prompt carries the history + system prompt
    assert prompts[1].startswith("You are a captioner.")
    assert "User: hello\nAssistant: REPLY1" in prompts[1]
    assert prompts[1].rstrip().endswith("User: again\nAssistant:")
    p.set_state(State.NULL)


def test_llamatexttransform_real_transformers(tmp_path):
    """Full transformers path with a tiny random GPT-2 saved locally
    (the model-path contract; published weights are the env gate)."""
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel, GPT2TokenizerFast
    import json
    vdir = tmp_path / "lm"
    vdir.mkdir()
    vocab = {chr(c): c - 33 for c in range(33, 127)}
    vocab["<|endoftext|>"] = len(vocab)
    (vdir / "vocab.json").write_text(json.dumps(vocab))
    (vdir / "merges.txt").write_text("#version: 0.2\n")
    tok = GPT2TokenizerFast(str(vdir / "vocab.json"),
                            str(vdir / "merges.txt"),
                            unk_token="<|endoftext|>",
                            bos_token="<|endoftext|>",
                            eos_token="<|endoftext|>")
    cfg = GPT2Config(vocab_size=len(vocab), n_embd=32, n_layer=1,
                     n_head=2, n_positions=256)
    torch.manual_seed(0)
    model = GPT2LMHeadModel(cfg)
    model.save_pretrained(str(vdir))
    tok.save_pretrained(str(vdir))

    p = parse_launch('appsrc name=src caps="text/x-raw, format=utf8" '
                     '! llamatexttransform name=lm ! appsink name=out')
    lm = p.get_by_name("lm")
    lm.model_path = str(vdir)
    lm.temp = 0.0           # greedy: deterministic
    lm.max_tokens = 8
    src, out = p.get_by_name("src"), p.get_by_name("out")
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(b"hi", pts=0, duration=SECOND))
    src.end_of_stream()
    p.run(timeout=120)
    assert out.is_eos        # random weights: any text, no errors
    p.set_state(State.NULL)
