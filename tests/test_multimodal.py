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
