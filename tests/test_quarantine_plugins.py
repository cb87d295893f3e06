"""O25 corrupt-target quarantine + O29 plugin loading tests."""

import gzip
import os

from pyspark.sql import functions as F

from restructure_hdfs_topic_spark.plans.quarantine import (
    find_corrupt_targets,
    quarantine_corrupt_targets,
)
from restructure_hdfs_topic_spark.plugins import load_plugin


def test_quarantine_corrupt_json_gz(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    df.coalesce(1).write.option("compression", "gzip").json(out)
    # Corrupt one file: truncate the gzip stream mid-member.
    data_files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".json.gz")
    ]
    good = spark.read.json(out).count()
    assert good == 10
    with open(data_files[0], "rb") as fh:
        blob = fh.read()
    with open(data_files[0], "wb") as fh:
        fh.write(blob[: len(blob) // 2])
    bad = find_corrupt_targets(spark, out, "json")
    assert len(bad) == 1 and bad[0].endswith(".json.gz")
    moved = quarantine_corrupt_targets(spark, out, "json")
    assert len(moved) == 1 and moved[0].endswith(".corrupted")
    # Reader now sees only intact files (corrupted name no longer matches).
    assert find_corrupt_targets(spark, out, "json") == []
    # Quarantining again with a fresh corrupt file appends -N, not overwrite.
    with open(data_files[0], "wb") as fh:
        fh.write(b"\x1f\x8b garbage")
    moved2 = quarantine_corrupt_targets(spark, out, "json")
    assert len(moved2) == 1 and moved2[0].endswith(".corrupted-1")


def _probe_plugin(properties):
    return {"kind": "probe", **properties}


def test_plugin_loading_builtin_and_spec():
    assert load_plugin("gzip", builtins={"gzip": "GZIP"}) == "GZIP"
    loaded = load_plugin(
        "tests.test_quarantine_plugins:_probe_plugin", {"a": 1}
    )
    assert loaded == {"kind": "probe", "a": 1}
    try:
        load_plugin("nosuch")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_quarantine_spares_sidecars_and_zip_targets(spark, tmp_path):
    """Schema sidecars (pretty-printed whole-file JSON) and healthy
    single-entry .csv.zip targets must NOT be quarantined; a genuinely
    corrupt zip must be."""
    import json
    import zipfile

    out = tmp_path / "out"
    out.mkdir()
    # Pretty-printed sidecar — valid JSON document, NOT JSON-lines.
    (out / "schema-topic.json").write_text(
        json.dumps({"type": "struct", "fields": [{"name": "a"}]}, indent=2)
    )
    # Healthy single-entry zip CSV (compression.repack_to_zip shape).
    with zipfile.ZipFile(out / "part-0.csv.zip", "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("part-0.csv", "a,b\n1,2\n")
    assert find_corrupt_targets(spark, str(out), "json") == []
    assert find_corrupt_targets(spark, str(out), "csv") == []
    # Truncated zip → corrupt.
    blob = (out / "part-0.csv.zip").read_bytes()
    (out / "part-1.csv.zip").write_bytes(blob[: len(blob) // 2])
    bad = find_corrupt_targets(spark, str(out), "csv")
    assert len(bad) == 1 and bad[0].endswith("part-1.csv.zip")
