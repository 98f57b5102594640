"""Multimodal plumbing: schema, actor-pool decode stage, frame sampling.
(Decode kernels are deterministic stubs — the libs aren't in this env —
but the Ray-side dataflow is real.)"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_assets_ray.stages import multimodal as mm


def test_synth_schema():
    t = mm.synth_media_table(10)
    assert t.schema.equals(mm.MEDIA_SCHEMA)


def test_real_codec_is_marked_unavailable():
    with pytest.raises(NotImplementedError):
        mm.MediaDecodeStage(codec="real")


def test_decode_stage_actor_pool():
    t = mm.synth_media_table(40)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        mm.MediaDecodeStage,
        batch_size=mm.MediaDecodeStage.suggested_batch_size,
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert got.num_rows == 40
    assert "payload" not in got.column_names  # dropped after decode
    assert (np.array(got["n_pixels"].to_pylist()) ==
            np.array(got["width"].to_pylist()) * np.array(got["height"].to_pylist())).all()
    feats = got["feature"].combine_chunks()
    assert len(feats[0]) == 16
    s = sum(feats[0].as_py())
    assert abs(s - 1.0) < 1e-9  # normalized histogram


def test_decode_deterministic():
    t = mm.synth_media_table(5)
    stage = mm.MediaDecodeStage()
    a = stage(t)["feature"].to_pylist()
    b = stage(t)["feature"].to_pylist()
    assert a == b


def test_frame_sampling_flatmap_shape():
    t = mm.synth_media_table(6, kind="video")
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        mm.FrameSampleStage,
        fn_constructor_kwargs=dict(n_frames=8, stride=2),
        batch_size=mm.FrameSampleStage.suggested_batch_size,
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert got.num_rows == 6 * 4  # frames 0,2,4,6 per media
    assert set(got["frame"].to_pylist()) == {0, 2, 4, 6}


def test_resize_stage_composes(ray_session):
    import ray.data

    from elasticsearch_assets_ray.stages.multimodal import (
        MediaDecodeStage,
        MediaResizeStage,
        synth_media_table,
    )

    t = synth_media_table(40)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        MediaResizeStage,
        fn_constructor_kwargs=dict(out_w=12, out_h=10),
        batch_size=MediaResizeStage.suggested_batch_size,
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).map_batches(
        MediaDecodeStage,
        batch_size=MediaDecodeStage.suggested_batch_size,
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    import pyarrow as pa

    res = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert res.num_rows == 40
    assert set(res["width"].to_pylist()) == {12}
    assert set(res["height"].to_pylist()) == {10}
    assert set(res["n_pixels"].to_pylist()) == {120}


# ---------------------------------------------------------------------------
# pure-Python PNG codec (stages/png.py)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters():
    import numpy as np

    from elasticsearch_assets_ray.stages.png import png_decode, png_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (23, 17), dtype=np.uint8)
    for ft in range(5):  # None / Sub / Up / Average / Paeth
        data = png_encode(img, filter_type=ft)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = png_decode(data)
        np.testing.assert_array_equal(out, img), ft


def test_png_rejects_corruption():
    import numpy as np
    import pytest as _pt

    from elasticsearch_assets_ray.stages.png import png_decode, png_encode

    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(png_encode(img))
    data[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with _pt.raises(ValueError, match="CRC"):
        png_decode(bytes(data))
    with _pt.raises(ValueError, match="signature"):
        png_decode(b"nope")


def test_decode_stage_png_codec(ray_session):
    import numpy as np
    import ray.data

    from elasticsearch_assets_ray.stages import multimodal as mm

    t = mm.synth_media_table(12, fmt="png")
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            mm.MediaDecodeStage,
            fn_constructor_kwargs={"codec": "png"},
            batch_size=4,
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    for _, r in out.iterrows():
        i = int(r.media_id)
        w = 8 + (i * 7919) % 56
        h = 8 + (i * 104729) % 56
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        want = int(((i * 31 + np.arange(w * h) * 17) % 256).sum())
        assert int(r.pix_sum) == want


# ---------------------------------------------------------------------------
# WAV codec (real RIFF PCM parser) + AudioFeatureStage
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_stdlib_parity():
    import io
    import wave as stdlib_wave

    import numpy as np

    from elasticsearch_assets_ray.stages.wav import wav_decode, wav_encode

    rng = np.random.default_rng(9)
    for n in (1, 7, 64, 255):  # odd sample counts exercise framing
        s = rng.integers(-32768, 32767, n).astype(np.int16)
        payload = wav_encode(s, sample_rate=16000)
        got, sr = wav_decode(payload)
        assert sr == 16000
        assert np.array_equal(got, s.astype(np.int64))
        # independent reference: stdlib wave reads the same frames
        with stdlib_wave.open(io.BytesIO(payload)) as w:
            ref = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        assert np.array_equal(got, ref.astype(np.int64))


def test_wav_decoder_chunk_walk():
    """The hand-rolled RIFF walker: trailing chunks skipped, odd-size pad
    honoured, malformed containers rejected."""
    import struct

    import numpy as np
    import pytest

    from elasticsearch_assets_ray.stages.wav import wav_decode, wav_encode

    s = np.arange(-5, 5, dtype=np.int16)
    base = wav_encode(s, sample_rate=8000)

    def with_extra_chunk(payload, fourcc, body):
        chunk = fourcc + struct.pack("<I", len(body)) + body + (b"\0" if len(body) % 2 else b"")
        out = payload + chunk
        return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]

    # trailing LIST chunk (odd-sized body → pad byte) is skipped cleanly
    extra = with_extra_chunk(base, b"LIST", b"INFOabc")
    got, sr = wav_decode(extra)
    assert np.array_equal(got, s.astype(np.int64)) and sr == 8000
    # ... even when it comes BEFORE data: rebuild with cue before data
    hdr, rest = base[:12], base[12:]
    cue = b"cue " + struct.pack("<I", 4) + b"\0\0\0\0"
    moved = hdr[:4] + struct.pack("<I", len(hdr + cue + rest) - 8) + hdr[8:] + cue + rest
    got2, _ = wav_decode(moved)
    assert np.array_equal(got2, s.astype(np.int64))
    with pytest.raises(ValueError):
        wav_decode(b"RIFX" + base[4:])          # bad magic
    with pytest.raises(ValueError):
        wav_decode(base[:20])                    # truncated
    stereo = base.replace(b"\x01\x00\x01\x00", b"\x01\x00\x02\x00", 1)
    with pytest.raises(ValueError):
        wav_decode(stereo)                       # stereo rejected


def test_audio_feature_stage(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages import multimodal as mm
    from elasticsearch_assets_ray.stages.wav import audio_features, wav_decode

    t = mm.synth_media_table(40, kind="audio", fmt="wav")
    out = pa.concat_tables(
        list(
            ray.data.from_arrow(t)
            .map_batches(
                mm.AudioFeatureStage,
                fn_constructor_kwargs={"codec": "wav"},
                batch_size=16,
                batch_format="pyarrow",
                concurrency=(1, 2),
            )
            .iter_batches(batch_format="pyarrow")
        )
    ).sort_by("media_id")
    assert out.num_rows == 40 and "payload" not in out.column_names
    # per-row parity with the scalar reference on the raw payloads
    for i in (0, 3, 17, 39):
        row = {k: out[k][i].as_py() for k in out.column_names}
        ref = audio_features(*wav_decode(t["payload"][i].as_py()))
        for k, v in ref.items():
            assert row[k] == v, (i, k)
    # closed form: n = 64 + (id*7919) % 192
    assert out["n_samples"].to_pylist()[:3] == [64, 64 + 7919 % 192, 64 + 2 * 7919 % 192]


def test_video_frame_sampling_real_codec(ray_session):
    """MJPNG container: every stride-th frame decodes to the closed-form
    content; stride=1 yields every frame; bad magic rejected."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from elasticsearch_assets_ray.stages.multimodal import (
        VideoFrameSampleStage,
        synth_media_table,
    )

    t = synth_media_table(6, fmt="mjpng", kind="video")
    out = VideoFrameSampleStage(stride=1)(t)
    # per-video frame counts = 4 + (id*13) % 9
    import collections

    cnt = collections.Counter(out["media_id"].to_pylist())
    for i in range(6):
        assert cnt[i] == 4 + (i * 13) % 9
    # closed-form pixel sums for a couple of (id, f) pairs
    for mid, f, w, h, s in zip(
        out["media_id"].to_pylist(), out["frame"].to_pylist(),
        out["width"].to_pylist(), out["height"].to_pylist(),
        out["pix_sum"].to_pylist(),
    ):
        assert w == 8 + (mid * 7919 + f * 101) % 24
        assert h == 8 + (mid * 104729 + f * 59) % 24
        want = int(((mid * 31 + f * 7 + np.arange(w * h, dtype=np.int64) * 17) % 256).sum())
        assert s == want
    # stride=3 samples frames 0,3,6,...
    out3 = VideoFrameSampleStage(stride=3)(t)
    assert all(f % 3 == 0 for f in out3["frame"].to_pylist())
    with pytest.raises(ValueError, match="MJPNG"):
        VideoFrameSampleStage()(
            pa.table({"media_id": pa.array([0], pa.int64()),
                      "payload": pa.array([b"XXXX1234"], pa.large_binary())})
        )
    with pytest.raises(ValueError, match="stride"):
        VideoFrameSampleStage(stride=0)
    # actor-pool path over a Dataset
    ds = ray.data.from_arrow(t)
    r = pa.concat_tables(list(
        ds.map_batches(VideoFrameSampleStage, fn_constructor_kwargs={"stride": 2},
                       batch_format="pyarrow", concurrency=(1, 2))
        .iter_batches(batch_format="pyarrow")
    ))
    assert r.num_rows == sum(-(-(4 + (i * 13) % 9) // 2) for i in range(6))
