"""Source-table seam (sources/catalog.py): catalog-first resolution
with a parquet fallback. The sandbox has no Iceberg jars, so these
tests pin the fallback and every downgrade path; the catalog branch
itself is exercised only when a runtime jar is present (skipif)."""

import os

import pytest

from tabular_data_semantics_py_spark.sources.catalog import (
    _ICEBERG_CATALOG_IMPL,
    _jvm_class_loadable,
    configured_catalog,
    read_source_table,
)


@pytest.fixture()
def no_catalog_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CATALOG", raising=False)


def test_fallback_reads_parquet(spark, tmp_path, no_catalog_env):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"repo": ["r1", "r2"], "path": ["a.csv", "b.csv"]}),
        str(tmp_path / "source_repos.parquet"),
    )
    df = read_source_table(spark, "source_repos", parquet_root=str(tmp_path))
    assert sorted(r["repo"] for r in df.collect()) == ["r1", "r2"]


def test_no_root_and_no_catalog_raises(spark, no_catalog_env):
    with pytest.raises(ValueError, match="source_repos"):
        read_source_table(spark, "source_repos")


def test_env_unset_means_no_catalog(spark, no_catalog_env):
    assert configured_catalog(spark) is None


def test_catalog_named_but_undefined_downgrades(spark, monkeypatch):
    # env names a catalog the session never defined -> parquet path
    monkeypatch.setenv("SPARK_GRAFT_CATALOG", "prod_cat.kg")
    assert configured_catalog(spark) is None


def test_catalog_defined_but_jar_missing_downgrades(spark, monkeypatch):
    # spark.sql.catalog.X present but its impl class is NOT on the
    # classpath (the ships-without---packages case): must downgrade,
    # not explode at first read
    monkeypatch.setenv("SPARK_GRAFT_CATALOG", "ice")
    spark.conf.set("spark.sql.catalog.ice", _ICEBERG_CATALOG_IMPL)
    try:
        assert not _jvm_class_loadable(spark, _ICEBERG_CATALOG_IMPL), (
            "sandbox unexpectedly has Iceberg jars; flip this test to "
            "exercise the catalog branch instead"
        )
        assert configured_catalog(spark) is None
    finally:
        spark.conf.unset("spark.sql.catalog.ice")


def test_jvm_class_probe_positive(spark):
    # sanity: the probe itself works for a class that certainly exists
    assert _jvm_class_loadable(spark, "java.lang.String")


@pytest.mark.skipif(
    "ICEBERG_JAR_PRESENT" not in os.environ,
    reason="no Iceberg runtime jar in the sandbox (ROUND_NOTES.md §4)",
)
def test_catalog_branch_reads_table(spark, monkeypatch):  # pragma: no cover
    monkeypatch.setenv("SPARK_GRAFT_CATALOG", "ice")
    spark.conf.set("spark.sql.catalog.ice", _ICEBERG_CATALOG_IMPL)
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    assert configured_catalog(spark) == "ice"
