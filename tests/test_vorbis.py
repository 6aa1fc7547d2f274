"""Ogg container + Vorbis decoder tests against real files with
pygame's SDL decoder as the conformance oracle."""

import os

import numpy as np
import pytest

HOUSE = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/"
         "data/house_lo.ogg")


def test_ogg_pages_and_packets():
    from gstpu.codecs.ogg import packets_of, parse_pages
    data = open(HOUSE, "rb").read()
    pages = list(parse_pages(data))          # CRC-checked
    assert pages[0].bos and pages[-1].eos
    assert len({p.serial for p in pages}) == 1
    seqs = [p.page_seq for p in pages]
    assert seqs == list(range(len(seqs)))
    pkts = [p for p, _ in packets_of(data)]
    # vorbis: 3 header packets then audio packets
    assert pkts[0][:7] == b"\x01vorbis"
    assert pkts[1][:7] == b"\x03vorbis"
    assert pkts[2][:7] == b"\x05vorbis"
    assert len(pkts) > 100
    assert all(p[0] & 1 == 0 for p in pkts[3:])   # audio packets


def test_ogg_crc_detects_corruption():
    from gstpu.codecs.ogg import parse_pages
    data = bytearray(open(HOUSE, "rb").read())
    data[100] ^= 0xFF
    with pytest.raises(ValueError, match="crc"):
        list(parse_pages(bytes(data)))


def _pygame_ref(path, rate, channels):
    os.environ["SDL_AUDIODRIVER"] = "dummy"
    import pygame
    import pygame.sndarray as sa
    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=channels)
    arr = sa.array(pygame.mixer.Sound(path)).astype(np.float32)
    return arr / 32768.0


def test_vorbis_decode_matches_libvorbis_oracle():
    from gstpu.codecs.vorbis import decode_ogg_vorbis
    pcm, rate = decode_ogg_vorbis(open(HOUSE, "rb").read())
    ref = _pygame_ref(HOUSE, rate, pcm.shape[0])
    if ref.ndim == 1:
        ref = ref[:, None]
    assert pcm.shape == (ref.shape[1], ref.shape[0])
    m = min(ref.shape[0], pcm.shape[1])
    for c in range(pcm.shape[0]):
        a, b = ref[:m, c], pcm[c, :m]
        corr = float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b)))
        rms = float(np.sqrt(((a - b) ** 2).mean()))
        assert corr > 0.9999, corr
        assert rms < 0.005, rms
        # with the spec-literal FLOOR1_fromdB_LOOKUP table the decode
        # is bit-exact up to the oracle's own 16-bit quantization:
        # at most 1 LSB difference, on <0.2% of samples
        q = np.clip(np.round(b * 32768), -32768, 32767) / 32768.0
        diff_lsb = np.abs(a - q) * 32768
        assert float(diff_lsb.max()) <= 1.0 + 1e-6
        assert float((diff_lsb > 0.5).mean()) < 2e-3


def test_lewtondec_pipeline():
    from gstpu import State, parse_launch
    from gstpu.core.audio import AudioInfo
    p = parse_launch(f"filesrc location={HOUSE} ! application/ogg ! "
                     f"oggdemux ! lewtondec ! appsink name=out")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    p.run()
    bufs = out.pull_all()
    info = AudioInfo.from_caps(out.caps)
    assert info.format == "F32LE" and info.rate == 11025
    samples = np.concatenate([info.view(b) for b in bufs], axis=0)
    assert samples.shape[0] == 78331      # exact granulepos length
    from gstpu.codecs.vorbis import decode_ogg_vorbis
    whole, _ = decode_ogg_vorbis(open(HOUSE, "rb").read())
    assert np.allclose(samples[:, 0], whole[0], atol=1e-6)
    p.set_state(State.NULL)
