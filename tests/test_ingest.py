"""ES ingest pipelines: processor semantics, eager validation, and the
reindex-transform composition."""

import pyarrow as pa
import pytest

from elasticsearch_assets_ray.pipelines.ingest import IngestPipeline
from elasticsearch_assets_ray.stages.bulk import register_script


def _batch():
    return pa.table(
        {
            "name": pa.array(["Ada_One", "Bob_Two"]),
            "v": pa.array([1.5, 2.5]),
            "keep": pa.array([10, 20]),
        }
    )


def test_processor_chain_order_and_semantics():
    @register_script("_t_double_v")
    def _double(t: pa.Table) -> dict:
        import pyarrow.compute as pc

        return {"v": pc.multiply(t["v"], pa.scalar(2.0))}

    pipe = IngestPipeline(
        [
            {"type": "lowercase", "field": "name"},
            {"type": "gsub", "field": "name", "pattern": "_", "replacement": "-"},
            {"type": "script", "name": "_t_double_v"},
            {"type": "convert", "field": "keep", "to": "string"},
            {"type": "set", "field": "tag", "value": "x"},
            {"type": "rename", "field": "tag", "target_field": "label"},
        ]
    )
    out = pipe(_batch())
    assert out["name"].to_pylist() == ["ada-one", "bob-two"]
    assert out["v"].to_pylist() == [3.0, 5.0]
    assert out["keep"].to_pylist() == ["10", "20"]
    assert out["label"].to_pylist() == ["x", "x"]
    # remove drops the column
    out2 = IngestPipeline([{"type": "remove", "field": "keep"}])(_batch())
    assert "keep" not in out2.column_names


def test_validation_is_eager():
    with pytest.raises(ValueError, match="unknown type"):
        IngestPipeline([{"type": "nope"}])
    with pytest.raises(ValueError, match="missing 'field'"):
        IngestPipeline([{"type": "lowercase"}])
    with pytest.raises(ValueError, match="no registered script"):
        IngestPipeline([{"type": "script", "name": "missing_script"}])
    with pytest.raises(ValueError, match="unknown target"):
        IngestPipeline([{"type": "convert", "field": "v", "to": "decimal"}])
    with pytest.raises(Exception):  # bad RE2 validated at construction
        IngestPipeline(
            [{"type": "gsub", "field": "n", "pattern": "(", "replacement": ""}]
        )


def test_runs_over_dataset_and_reindex_transform(ray_session):
    import ray.data

    pipe = IngestPipeline([{"type": "uppercase", "field": "name"}])
    ds = ray.data.from_arrow(_batch()).repartition(2)
    out = pa.concat_tables(list(pipe.run(ds).iter_batches(batch_format="pyarrow")))
    assert sorted(out["name"].to_pylist()) == ["ADA_ONE", "BOB_TWO"]
