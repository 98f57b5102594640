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
