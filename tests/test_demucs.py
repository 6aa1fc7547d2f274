"""demucs element: per-stem request pads + TorchScript model contract
(reference audio/demucs/src/demucs/imp.rs; torch is first-class here
instead of embedded via pyo3)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gstpu import Buffer, State, parse_launch  # noqa: E402
from gstpu.core.audio import AudioInfo  # noqa: E402
from gstpu.core.registry import make  # noqa: E402

INFO = AudioInfo("F32LE", 44100, 2)


class TinySeparator(torch.nn.Module):
    """Deterministic 4-stem toy separator honoring the demucs tensor
    contract: (1, C, T) -> (1, 4, C, T)."""

    def forward(self, wav):
        scales = torch.tensor([0.1, 0.2, 0.3, 0.4])
        return wav[:, None, :, :] * scales[None, :, None, None]


@pytest.fixture()
def model_path(tmp_path):
    path = tmp_path / "sep.pt"
    torch.jit.script(TinySeparator()).save(str(path))
    return str(path)


def test_demucs_stems(model_path):
    el = make("demucs", model_location=model_path, segment=0.1)
    vocals = el.request_pad("src_vocals")
    drums = el.request_pad("src_drums")
    from gstpu.core.registry import make as mk
    sinks = {}
    for stem, pad in (("vocals", vocals), ("drums", drums)):
        s = mk("appsink")
        pad.link(s.static_pad("sink"))
        s.set_state(State.PLAYING)
        sinks[stem] = s
    src = mk("appsrc")
    src.set_property("caps", INFO.to_caps())
    src.static_pad("src").link(el.static_pad("sink"))
    el.set_state(State.PLAYING)
    src.set_state(State.PLAYING)

    n = int(0.25 * 44100)
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
    src.push_buffer(Buffer(x, pts=0))
    src.end_of_stream()
    while src.parent is None and True:
        break
    # drive manually (no pipeline wrapper here)
    from gstpu.runtime.scheduler import Context
    for t in src.iterate_tasks():
        t.prepare(); t.start()
        while t.run_once().name in ("CONTINUE",):
            pass

    got_v = np.concatenate([INFO.view(b) for b in
                            sinks["vocals"].pull_all()])
    got_d = np.concatenate([INFO.view(b) for b in
                            sinks["drums"].pull_all()])
    assert got_v.shape == x.shape and got_d.shape == x.shape
    np.testing.assert_allclose(got_v, x * 0.4, atol=1e-6)  # vocals=0.4
    np.testing.assert_allclose(got_d, x * 0.1, atol=1e-6)  # drums=0.1
    assert sinks["vocals"].is_eos and sinks["drums"].is_eos


def test_demucs_missing_weights_errors():
    el = make("demucs")                 # no pip demucs in this env
    el.request_pad("src_vocals")
    from gstpu.core.event import CapsEvent
    el.set_state(State.PLAYING)
    ok = el.static_pad("sink").send_event(CapsEvent(INFO.to_caps()))
    assert not ok
