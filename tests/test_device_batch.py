"""DeviceContext batched execution (VERDICT r1 #3): N parallel
`appsrc ! rsaudioecho ! appsink` streams sharing a device context
execute as ONE fused (B, block) dispatch per block, and the outputs
are bit-identical to the per-stream (unbatched) element path."""

import numpy as np

from gstpu import Buffer, State, parse_launch
from gstpu.core.audio import AudioInfo
from gstpu.runtime.device_batch import DeviceContext

RATE = 48_000
BLOCK = 4_800            # flattened samples per batch row
INFO = AudioInfo("F64LE", RATE, 1)


def _flat(b):
    return INFO.view(b).reshape(-1)


def _mk_pipeline(i, ctx_name, block=BLOCK):
    p = parse_launch(
        f'appsrc name=src caps="audio/x-raw, format=F64LE, '
        f'rate={RATE}, channels=1, layout=interleaved" ! '
        f'rsaudioecho name=echo delay=10000000 max-delay=10000000 '
        f'intensity=0.4 feedback=0.3 context={ctx_name} '
        f'context-block={block} ! appsink name=sink')
    return p


def _reference_outputs(signals):
    """Per-stream unbatched echo path."""
    outs = []
    for sig in signals:
        p = parse_launch(
            f'appsrc name=src caps="audio/x-raw, format=F64LE, '
            f'rate={RATE}, channels=1, layout=interleaved" ! '
            f'rsaudioecho delay=10000000 max-delay=10000000 '
            f'intensity=0.4 feedback=0.3 ! appsink name=sink')
        src, sink = p.get_by_name("src"), p.get_by_name("sink")
        p.set_state(State.PLAYING)
        for blk in sig:
            src.push_buffer(Buffer(blk.reshape(-1, 1)))
        src.end_of_stream()
        p.run()
        outs.append(np.concatenate(
            [_flat(b) for b in sink.pull_all()]))
        p.set_state(State.NULL)
    return outs


def test_64_streams_one_dispatch_bit_identical():
    n_streams, n_blocks = 64, 3
    rng = np.random.default_rng(0)
    signals = [[rng.uniform(-1, 1, BLOCK) for _ in range(n_blocks)]
               for _ in range(n_streams)]

    ref = _reference_outputs(signals)

    DeviceContext.release("ctx-test")
    pipes = [_mk_pipeline(i, "ctx-test") for i in range(n_streams)]
    for p in pipes:
        p.set_state(State.PLAYING)
    ctx = DeviceContext.acquire("ctx-test", BLOCK)

    # interleave pushes stream-by-stream: each full round completes
    # the batch window -> exactly one fused dispatch per block round
    # (members join at caps negotiation, i.e. on their first push)
    for k in range(n_blocks):
        for i, p in enumerate(pipes):
            p.get_by_name("src").push_buffer(
                Buffer(signals[i][k].reshape(-1, 1)))
            while p.iterate():      # drive this stream's block in
                pass
        assert len(ctx.members) == n_streams
        assert ctx.fire_count == k + 1, \
            "one fused dispatch per full block round"
    for p in pipes:
        p.get_by_name("src").end_of_stream()
        p.run()

    for i, p in enumerate(pipes):
        got = np.concatenate(
            [_flat(b) for b in p.get_by_name("sink").pull_all()])
        np.testing.assert_array_equal(got, ref[i]), i
        p.set_state(State.NULL)
    DeviceContext.release("ctx-test")


def test_ragged_buffers_reblocked():
    """Arbitrary input buffer sizes are re-blocked to the batch block
    (the reference's adapter pattern, SURVEY §5.7); output samples
    stay bit-identical to the unbatched path."""
    rng = np.random.default_rng(1)
    total = BLOCK * 2 + 777
    sigs = [rng.uniform(-1, 1, total) for _ in range(3)]
    # reference: single big push each
    ref = _reference_outputs([[s] for s in sigs])

    DeviceContext.release("ctx-rag")
    pipes = [_mk_pipeline(i, "ctx-rag") for i in range(3)]
    for p in pipes:
        p.set_state(State.PLAYING)
    # ragged pushes: different chunkings per stream
    chunkings = [(1000, 3000, total - 4000),
                 (BLOCK, total - BLOCK),
                 (total,)]
    for i, p in enumerate(pipes):
        off = 0
        for c in chunkings[i]:
            p.get_by_name("src").push_buffer(
                Buffer(sigs[i][off:off + c].reshape(-1, 1)))
            off += c
        while p.iterate():
            pass
    for p in pipes:
        p.get_by_name("src").end_of_stream()
        p.run()
    for i, p in enumerate(pipes):
        got = np.concatenate(
            [_flat(b) for b in p.get_by_name("sink").pull_all()])
        np.testing.assert_array_equal(got, ref[i])
        p.set_state(State.NULL)
    DeviceContext.release("ctx-rag")


def test_eos_straggler_drains_masked():
    """A stream reaching EOS with a partial block drains via a padded
    solo step without disturbing the other members' state."""
    rng = np.random.default_rng(2)
    a = [rng.uniform(-1, 1, BLOCK) for _ in range(2)]
    b = [rng.uniform(-1, 1, BLOCK // 2)]          # straggler
    ref = _reference_outputs([a, b])

    DeviceContext.release("ctx-eos")
    p1, p2 = _mk_pipeline(0, "ctx-eos"), _mk_pipeline(1, "ctx-eos")
    for p in (p1, p2):
        p.set_state(State.PLAYING)
    p2.get_by_name("src").push_buffer(Buffer(b[0].reshape(-1, 1)))
    p2.get_by_name("src").end_of_stream()
    p2.run()
    got2 = np.concatenate(
        [_flat(x) for x in p2.get_by_name("sink").pull_all()])
    np.testing.assert_array_equal(got2, ref[1])

    for blk in a:
        p1.get_by_name("src").push_buffer(Buffer(blk.reshape(-1, 1)))
    p1.get_by_name("src").end_of_stream()
    p1.run()
    got1 = np.concatenate(
        [_flat(x) for x in p1.get_by_name("sink").pull_all()])
    np.testing.assert_array_equal(got1, ref[0])
    for p in (p1, p2):
        p.set_state(State.NULL)
    DeviceContext.release("ctx-eos")


def test_depth2_overlapped_distribution():
    """depth=2 defers each batch's distribution until the next submit
    (host demux overlaps device compute); outputs are identical, one
    batch later, and fully flushed at EOS."""
    rng = np.random.default_rng(3)
    sig = [rng.uniform(-1, 1, BLOCK) for _ in range(3)]
    ref = _reference_outputs([sig])

    DeviceContext.release("ctx-d2")
    DeviceContext.acquire("ctx-d2", BLOCK, depth=2)
    p = _mk_pipeline(0, "ctx-d2")
    p.set_state(State.PLAYING)
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    got = []

    def pull():
        return [_flat(x) for x in sink.pull_all()]

    src.push_buffer(Buffer(sig[0].reshape(-1, 1)))
    while p.iterate():
        pass
    first = pull()
    assert len(first) == 0                # batch 1 in flight
    src.push_buffer(Buffer(sig[1].reshape(-1, 1)))
    while p.iterate():
        pass
    second = pull()
    assert len(second) == 1               # batch 1 lands on submit 2
    got += second
    src.push_buffer(Buffer(sig[2].reshape(-1, 1)))
    src.end_of_stream()
    p.run()
    got += pull()
    np.testing.assert_array_equal(np.concatenate(got), ref[0])
    p.set_state(State.NULL)
    DeviceContext.release("ctx-d2")


def test_video_streams_batch_through_context():
    """VIDEO extension of L2': N `appsrc ! hsvfilter ! appsink`
    streams sharing a DeviceContext execute as ONE batched frame
    dispatch, bit-identical to the per-stream path."""
    import numpy as np

    from gstpu.core.video import VideoInfo
    from gstpu.runtime.device_batch import DeviceContext

    W, H, N_FRAMES, N_STREAMS = 64, 32, 3, 8
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256,
                          (N_STREAMS, N_FRAMES, H, W, 4),
                          dtype=np.uint8)

    def run(ctx_name=None):
        outs = []
        pipes = []
        for s in range(N_STREAMS):
            extra = f"context=v{ctx_name} " if ctx_name else ""
            p = parse_launch(
                f'appsrc name=src caps="video/x-raw, format=RGBA, '
                f'width={W}, height={H}, framerate=30/1" ! '
                f'hsvfilter hue_shift=42 saturation_mul=1.2 {extra}'
                f'! appsink name=sink')
            pipes.append(p)
            p.set_state(State.PLAYING)
        for s, p in enumerate(pipes):
            src = p.get_by_name("src")
            for f in range(N_FRAMES):
                src.push_buffer(Buffer(frames[s, f]))
            src.end_of_stream()
        for p in pipes:
            p.run()
            sink = p.get_by_name("sink")
            outs.append([np.array(
                VideoInfo("RGBA", W, H).view(b))
                for b in sink.pull_all()])
            p.set_state(State.NULL)
        return outs

    batched = run("ideo")
    single = run(None)
    assert all(len(o) == N_FRAMES for o in batched)
    for s in range(N_STREAMS):
        for f in range(N_FRAMES):
            np.testing.assert_array_equal(batched[s][f],
                                          single[s][f])
    # alpha passed through untouched
    np.testing.assert_array_equal(batched[0][0][..., 3],
                                  frames[0, 0][..., 3])


def test_video_chain_batches_both_stages():
    """hsvfilter AND colorlut each batch N streams (two contexts,
    one per kernel): full chain output equals the per-stream path."""
    import numpy as np

    from gstpu.core.video import VideoInfo
    from gstpu.ops.lut import identity_lut

    W, H, N_STREAMS = 48, 24, 6
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (N_STREAMS, 2, H, W, 4),
                          dtype=np.uint8)
    lut = identity_lut(size=5)

    def run(batched):
        outs, pipes = [], []
        for s in range(N_STREAMS):
            extra_h = "context=vh " if batched else ""
            extra_c = "context=vc " if batched else ""
            p = parse_launch(
                f'appsrc name=src caps="video/x-raw, format=RGBA, '
                f'width={W}, height={H}, framerate=30/1" ! '
                f'hsvfilter hue_shift=33 {extra_h}! '
                f'colorlut name=cl {extra_c}! appsink name=sink')
            p.get_by_name("cl").set_lut(lut)
            pipes.append(p)
            p.set_state(State.PLAYING)
        for s, p in enumerate(pipes):
            src = p.get_by_name("src")
            for f in range(2):
                src.push_buffer(Buffer(frames[s, f]))
            src.end_of_stream()
        for p in pipes:
            p.run()
            sink = p.get_by_name("sink")
            outs.append([np.array(VideoInfo("RGBA", W, H).view(b))
                         for b in sink.pull_all()])
            p.set_state(State.NULL)
        return outs

    b = run(True)
    u = run(False)
    for s in range(N_STREAMS):
        assert len(b[s]) == 2
        for f in range(2):
            np.testing.assert_array_equal(b[s][f], u[s][f])


def test_hsvdetector_batches_streams():
    import numpy as np

    from gstpu.core.video import VideoInfo

    W, H, N = 32, 16, 4
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (N, 2, H, W, 4), dtype=np.uint8)

    def run(batched):
        outs, pipes = [], []
        for s in range(N):
            extra = "context=vdet " if batched else ""
            p = parse_launch(
                f'appsrc name=src caps="video/x-raw, format=RGBA, '
                f'width={W}, height={H}, framerate=30/1" ! '
                f'hsvdetector hue_ref=120 hue_var=60 {extra}! '
                f'appsink name=sink')
            pipes.append(p)
            p.set_state(State.PLAYING)
        for s, p in enumerate(pipes):
            src = p.get_by_name("src")
            for f in range(2):
                src.push_buffer(Buffer(frames[s, f]))
            src.end_of_stream()
        for p in pipes:
            p.run()
            outs.append([np.array(VideoInfo("RGBA", W, H).view(b))
                         for b in p.get_by_name("sink").pull_all()])
            p.set_state(State.NULL)
        return outs

    b, u = run(True), run(False)
    for s in range(N):
        assert len(b[s]) == 2
        for f in range(2):
            np.testing.assert_array_equal(b[s][f], u[s][f])


def test_context_checkpoint_resume_bit_exact():
    """SURVEY 5.4: snapshot a live batched context mid-stream, build
    a fresh context (replacement process), restore, continue — the
    outputs equal the uninterrupted run bit-for-bit."""
    import numpy as np

    from gstpu.runtime.device_batch import (DeviceContext,
                                            restore_context,
                                            snapshot_context)

    signals = [np.random.default_rng(s).uniform(-0.5, 0.5,
                                                (6, BLOCK))
               for s in range(4)]

    def run(tmpdir, interrupt):
        DeviceContext.release("ckpt-ctx")
        pipes = [_mk_pipeline(i, "ckpt-ctx") for i in range(4)]
        for p in pipes:
            p.set_state(State.PLAYING)
        outs = [[] for _ in range(4)]

        def push_block(k):
            for i, p in enumerate(pipes):
                p.get_by_name("src").push_buffer(
                    Buffer(signals[i][k].reshape(-1, 1)))
            for p in pipes:
                p.iterate()

        for k in range(3):
            push_block(k)
        if interrupt:
            ctx = DeviceContext.acquire("ckpt-ctx", BLOCK)
            path = f"{tmpdir}/ctx.ckpt.npz"
            snapshot_context(ctx, path)
            # simulate replacement: wipe states, then restore
            import jax.numpy as jnp
            for m in ctx.members:
                if m.spec is not None:
                    m.state = m.spec["init_state"]()
            restore_context(ctx, path)
        for k in range(3, 6):
            push_block(k)
        for i, p in enumerate(pipes):
            p.get_by_name("src").end_of_stream()
            p.run()
            outs[i] = np.concatenate(
                [_flat(b) for b in
                 p.get_by_name("sink").pull_all()])
            p.set_state(State.NULL)
        DeviceContext.release("ckpt-ctx")
        return outs

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        a = run(d, interrupt=False)
    with tempfile.TemporaryDirectory() as d:
        b = run(d, interrupt=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_video_chain_single_context_fused():
    """hsvfilter ! colorlut sharing ONE context: the chain fuses to a
    single dispatch (VERDICT r2 item 8) and stays frame-exact vs the
    per-stream path; device-resident DeviceRow input works too."""
    import numpy as np

    import jax.numpy as jnp

    from gstpu.core.video import VideoInfo
    from gstpu.ops.lut import identity_lut
    from gstpu.runtime.device_batch import DeviceContext, DeviceRow

    W, H, N = 32, 16, 3
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (N, 2, H, W, 4), dtype=np.uint8)
    lut = identity_lut(size=5)

    def run(mode):
        DeviceContext.release("vf")
        outs, pipes = [], []
        for s in range(N):
            extra = "context=vf " if mode != "plain" else ""
            p = parse_launch(
                f'appsrc name=src caps="video/x-raw, format=RGBA, '
                f'width={W}, height={H}, framerate=30/1" ! '
                f'hsvfilter hue_shift=33 {extra}! '
                f'colorlut name=cl {extra}! appsink name=sink')
            p.get_by_name("cl").set_lut(lut)
            pipes.append(p)
            p.set_state(State.PLAYING)
        if mode == "device":
            banks = [jnp.asarray(frames[:, f].reshape(N, -1))
                     for f in range(2)]
            for f in range(2):
                for s, p in enumerate(pipes):
                    p.get_by_name("src").push_buffer(
                        Buffer(DeviceRow(banks[f], s)))
                    while p.iterate():
                        pass
            for p in pipes:
                p.get_by_name("src").end_of_stream()
                p.run()
        else:
            for s, p in enumerate(pipes):
                src = p.get_by_name("src")
                for f in range(2):
                    src.push_buffer(Buffer(frames[s, f]))
                src.end_of_stream()
            for p in pipes:
                p.run()
        for p in pipes:
            outs.append([np.asarray(
                VideoInfo("RGBA", W, H).view(b))
                for b in p.get_by_name("sink").pull_all()])
            p.set_state(State.NULL)
        DeviceContext.release("vf")
        return outs

    plain = run("plain")
    fused = run("fused")
    dev = run("device")
    for s in range(N):
        assert len(fused[s]) == 2 and len(dev[s]) == 2
        for f in range(2):
            np.testing.assert_array_equal(fused[s][f], plain[s][f])
            np.testing.assert_array_equal(dev[s][f], plain[s][f])
