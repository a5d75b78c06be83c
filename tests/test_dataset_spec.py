"""Unified x-dataset spec section over the flattened span table."""

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators.dataset_spec import validate_dataset
from jsonschema_rs_spark.sources.spans import flat_spans
from jsonschema_rs_spark.spec import SpecError

SF = "/root/testdata/sf0.001"

SPEC = {
    "properties": {"doc_id": {"type": "string"}},
    "x-dataset": {
        "columns": {
            "offset": {"min": 0},          # planted negatives violate
            "text": {"max_null_rate": 0.05},  # media spans have null text
            "kind": {"max_distinct": 2},   # 4 kinds observed -> violates
        },
        "unique": ["doc_id"],              # flat grain: every doc repeats!
        "referential": {
            "media_ref": {"catalog": "media_catalog", "key": "media_ref"},
        },
        "drift": {
            "chi2": {"column": "kind", "threshold": 27.0},
        },
    },
}


def test_dataset_spec_end_to_end(spark):
    flat = flat_spans(spark, SF).cache()
    catalog = (
        flat.filter(F.col("media_ref").isNotNull())
        .select("media_ref").distinct()
        .filter(F.substring("media_ref", 9, 12).cast("int") % 16 != 0)
    )
    out = validate_dataset(
        flat, SPEC, "part_key", catalogs={"media_catalog": catalog}
    ).cache()
    by_cid = {
        r["constraint_id"]
        for r in out.select("constraint_id").distinct().collect()
    }
    assert "dataset/offset/min" in by_cid
    assert "dataset/text/null_rate" in by_cid
    assert "dataset/kind/max_cardinality" in by_cid
    assert "dataset/unique/doc_id" in by_cid          # spans repeat per doc
    assert "dataset/referential/media_ref" in by_cid  # planted dangling refs
    # homogeneous partitions: chi2 must NOT flag anything
    assert "dataset/drift_chi2/kind" not in by_cid
    assert set(out.columns) == {"scope", "scope_key", "constraint_id",
                                "observed"}
    out.unpersist()
    flat.unpersist()


def test_dataset_spec_missing_catalog(spark):
    flat = flat_spans(spark, SF)
    with pytest.raises(SpecError, match="catalog"):
        validate_dataset(flat, SPEC, "part_key", catalogs={})
