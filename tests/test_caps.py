"""Caps algebra tests (negotiation model, SURVEY.md §2.1)."""

from fractions import Fraction

import pytest

from gstpu.core.caps import (AnyList, Caps, FractionRange, IntRange,
                             Structure, parse_caps)


def test_parse_simple():
    c = parse_caps("audio/x-raw, format=F32LE, rate=48000, channels=2")
    assert len(c) == 1
    s = c[0]
    assert s.name == "audio/x-raw"
    assert s["format"] == "F32LE"
    assert s["rate"] == 48000
    assert s["channels"] == 2
    assert c.is_fixed()


def test_parse_ranges_and_lists():
    c = parse_caps("audio/x-raw, format={F32LE, F64LE}, rate=[1,192000], "
                   "channels=[1,8]")
    s = c[0]
    assert s["format"] == AnyList(("F32LE", "F64LE"))
    assert s["rate"] == IntRange(1, 192000)
    assert not c.is_fixed()


def test_parse_fraction():
    c = parse_caps("video/x-raw, framerate=30/1, width=1920, height=1080, "
                   "format=RGBA")
    assert c[0]["framerate"] == Fraction(30, 1)


def test_parse_multiple_structures():
    c = parse_caps("audio/x-raw, rate=48000; audio/x-flac")
    assert len(c) == 2
    assert c[1].name == "audio/x-flac"


def test_intersect_fixed_with_range():
    a = parse_caps("audio/x-raw, rate=[1,192000], format={F32LE,F64LE}")
    b = parse_caps("audio/x-raw, rate=48000, format=F32LE, channels=2")
    i = a.intersect(b)
    assert len(i) == 1
    assert i[0]["rate"] == 48000
    assert i[0]["format"] == "F32LE"
    assert i[0]["channels"] == 2


def test_intersect_empty():
    a = parse_caps("audio/x-raw, rate=44100")
    b = parse_caps("audio/x-raw, rate=48000")
    assert a.intersect(b).is_empty()
    assert not a.can_intersect(b)
    c = parse_caps("video/x-raw")
    assert a.intersect(c).is_empty()


def test_intersect_ranges():
    a = Caps([Structure("x/y", n=IntRange(10, 100))])
    b = Caps([Structure("x/y", n=IntRange(50, 200))])
    i = a.intersect(b)
    assert i[0]["n"] == IntRange(50, 100)


def test_any_caps():
    a = Caps.any()
    b = parse_caps("audio/x-raw, rate=48000")
    assert a.intersect(b) == b
    assert b.is_subset(a)
    assert not a.is_subset(b)


def test_subset():
    fixed = parse_caps("audio/x-raw, rate=48000, format=F32LE")
    tmpl = parse_caps("audio/x-raw, rate=[1,192000], format={F32LE,F64LE}")
    assert fixed.is_subset(tmpl)
    assert not tmpl.is_subset(fixed)


def test_fixate():
    c = parse_caps("audio/x-raw, rate=[8000,192000], format={F32LE,F64LE}, "
                   "channels=[1,8]")
    f = c.fixate()
    assert f.is_fixed()
    assert f[0]["rate"] == 8000
    assert f[0]["format"] == "F32LE"


def test_fixate_near():
    c = parse_caps("audio/x-raw, rate=[8000,192000]")
    near = parse_caps("audio/x-raw, rate=48000")
    f = c.fixate(near=near)
    assert f[0]["rate"] == 48000


def test_fraction_range():
    c = Caps([Structure("video/x-raw",
                        framerate=FractionRange(Fraction(0), Fraction(120)))])
    b = Caps([Structure("video/x-raw", framerate=Fraction(30, 1))])
    assert c.intersect(b)[0]["framerate"] == Fraction(30, 1)


def test_roundtrip_repr():
    c = parse_caps("audio/x-raw, format={F32LE,F64LE}, rate=[1,192000]")
    c2 = parse_caps(repr(c))
    assert c == c2
