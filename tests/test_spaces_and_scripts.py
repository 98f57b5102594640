"""S3/S5 spaces surface (config validation, xLucene translation golden
strings, ReaderClient-swap), K4 scripted updates, Q3 char-class
expansion."""

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice
from elasticsearch_assets_ray.sources.spaces import (
    SpacesAPIConfig,
    SpacesReaderAPI,
    translate_slice,
)


def test_spaces_config_validation():
    ok = SpacesAPIConfig(endpoint="https://x", token="t", index="i")
    assert ok.retry == 3 and ok.timeout_ms == 300_000
    with pytest.raises(ValueError, match="token"):
        SpacesAPIConfig(endpoint="https://x", token="", index="i")
    with pytest.raises(ValueError, match="timeout"):
        SpacesAPIConfig(endpoint="https://x", token="t", index="i", timeout_ms=0)


def test_translate_golden_strings():
    # range clause: inclusive lower, EXCLUSIVE upper (reference
    # SpacesReaderClient.translateSearchQuery range printing)
    s = ReaderSlice(start=datetime(2024, 1, 1), end=datetime(2024, 2, 1))
    assert (
        translate_slice(s, date_col="created")
        == "created:[2024-01-01T00:00:00 TO 2024-02-01T00:00:00}"
    )
    assert translate_slice(ReaderSlice(keys=["ab"]), key_col="uuid") == "uuid:ab*"
    assert (
        translate_slice(ReaderSlice(keys=["a", "b"]), key_col="uuid")
        == "(uuid:a* OR uuid:b*)"
    )
    assert (
        translate_slice(ReaderSlice(keys=["ab"], keys_exact=True), key_col="uuid")
        == "uuid:ab"
    )
    s = ReaderSlice(start=datetime(2024, 1, 1), keys=["x"], query="foo bar")
    assert (
        translate_slice(s, date_col="d", key_col="k")
        == "d:[2024-01-01T00:00:00 TO *} AND k:x* AND (foo bar)"
    )


def test_spaces_reader_backend_swap(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"k": pa.array(["a1", "a2", "b1"]), "v": pa.array([1, 2, 3])}), p
    )
    local = ReaderAPI(p, key_col="k")
    api = SpacesReaderAPI(
        SpacesAPIConfig(endpoint="https://s", token="t", index="i"), local=local
    )
    out = api.fetch(ReaderSlice(keys=["a"]))
    assert out.num_rows == 2 and api.records_fetched == 2
    assert api.count(ReaderSlice(keys=["b"])) == 1

    # transport injection (the HTTP seam): receives the xLucene string
    seen = {}

    def fake_transport(xl, cfg):
        seen["xl"] = xl
        return pa.table({"k": pa.array(["z"])})

    api2 = SpacesReaderAPI(
        SpacesAPIConfig(endpoint="https://s", token="t", index="i"),
        local=local,
        transport=fake_transport,
    )
    api2.fetch(ReaderSlice(keys=["a"]))
    assert seen["xl"] == "k:a*"

    bare = SpacesReaderAPI(SpacesAPIConfig(endpoint="e", token="t", index="i"))
    with pytest.raises(RuntimeError, match="transport"):
        bare.fetch(ReaderSlice(keys=["a"]))


def test_expand_charclass_prefix():
    from elasticsearch_assets_ray.sources.reader import expand_charclass_prefix

    assert expand_charclass_prefix("a[b-d].*") == ["ab", "ac", "ad"]
    assert expand_charclass_prefix("src[0-2x]") == ["src0", "src1", "src2", "srcx"]
    with pytest.raises(ValueError):
        expand_charclass_prefix("no-class-here")
    with pytest.raises(ValueError):
        expand_charclass_prefix("a[z-a]")


def test_scripted_update(ray_session, tmp_path):
    import ray.data

    from elasticsearch_assets_ray.stages.bulk import register_script, scripted_update

    base = pa.table(
        {"k": pa.array([1, 2, 3, 4], pa.int64()), "bal": pa.array([10.0, 20.0, 30.0, 40.0])}
    )
    upd = pa.table({"k": pa.array([2, 4], pa.int64()), "delta": pa.array([5.0, -1.0])})

    @register_script("add_delta")
    def add_delta(j: pa.Table) -> dict:
        return {"bal": pc.add(j["bal"], j["__u_delta"])}

    out = pa.concat_tables(
        list(
            scripted_update(
                ray.data.from_arrow(base).repartition(2), upd, "k", "add_delta", ["delta"]
            ).iter_batches(batch_format="pyarrow")
        )
    ).sort_by([("k", "ascending")])
    assert out["bal"].to_pylist() == [10.0, 25.0, 30.0, 39.0]
    assert out.column_names == ["k", "bal"]
