"""Batch-mode pipeline tests with the edge fixtures from FIXTURES.md §6."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from flinkproj_spark.pipelines import (
    clean_transform,
    report_aggregate,
    report_parse,
    report_late_split,
)
from flinkproj_spark.sources.dims import dim_area


def _raw(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


GOOD = json.dumps({
    "dt": "2018-01-01 11:11:11",
    "countryCode": "US",
    "data": [
        {"type": "s1", "score": 0.3, "level": "A"},
        {"type": "s2", "score": 0.1, "level": "B"},
    ],
})
UNKNOWN_COUNTRY = json.dumps({
    "dt": "2018-01-01 12:00:00",
    "countryCode": "ID",          # not in the areas dim → 'other'
    "data": [{"type": "s3", "score": 0.5, "level": "C"}],
})
EMPTY_DATA = json.dumps({"dt": "2018-01-01 13:00:00", "countryCode": "TW", "data": []})
MALFORMED = "{not json at all"


class TestCleanPipeline:
    def test_explode_and_enrich(self, spark):
        out = clean_transform(_raw(spark, [GOOD]), dim_area(spark)).collect()
        assert len(out) == 2  # one per data[] element (FIXTURES.md §5)
        recs = sorted((json.loads(r.value) for r in out), key=lambda r: r["type"])
        assert recs[0] == {"type": "s1", "score": 0.3, "level": "A",
                           "area": "AREA_US", "dt": "2018-01-01 11:11:11"}
        assert recs[1]["type"] == "s2"

    def test_unknown_country_gets_other(self, spark):
        out = clean_transform(_raw(spark, [UNKNOWN_COUNTRY]), dim_area(spark)).collect()
        assert json.loads(out[0].value)["area"] == "other"

    def test_empty_data_array_yields_no_rows(self, spark):
        assert clean_transform(_raw(spark, [EMPTY_DATA]), dim_area(spark)).count() == 0

    def test_malformed_json_dropped(self, spark):
        assert clean_transform(_raw(spark, [MALFORMED]), dim_area(spark)).count() == 0

    def test_comma_list_dim_inversion(self, spark):
        dim = {r.country: r.area for r in dim_area(spark).collect()}
        assert dim == {"US": "AREA_US", "TW": "AREA_CT", "HK": "AREA_CT",
                       "PK": "AREA_AR", "KW": "AREA_AR", "SA": "AREA_AR", "IN": "AREA_IN"}


def _audit(dt, typ="shelf", area="AREA_US", user="shenhe1"):
    return json.dumps({"dt": dt, "type": typ, "username": user, "area": area})


class TestReportPipeline:
    def test_bad_timestamp_dropped(self, spark):
        lines = [_audit("2018-01-01 10:11:22"), _audit("2018-13-99 xx"), _audit("")]
        assert report_parse(_raw(spark, lines)).count() == 1

    def test_window_count_and_max(self, spark):
        lines = [
            _audit("2018-01-01 10:00:05"),
            _audit("2018-01-01 10:00:29"),   # same 30 s window
            _audit("2018-01-01 10:00:30"),   # boundary → next window (FIXTURES.md §6.8)
            _audit("2018-01-01 10:00:31", typ="black"),
        ]
        rows = report_aggregate(report_parse(_raw(spark, lines))).collect()
        by_key = {(r.type, r.time): r for r in rows}
        first = by_key[("shelf", "2018-01-01 10:00:29")]
        assert first["count"] == 2
        assert by_key[("shelf", "2018-01-01 10:00:30")]["count"] == 1
        assert by_key[("black", "2018-01-01 10:00:31")]["count"] == 1
        # deterministic idempotency key (DataReport.java:181)
        assert first.doc_id == "2018-01-01_10:00:29-shelf-AREA_US"

    def test_duplicate_events_not_deduped(self, spark):
        lines = [_audit("2018-01-01 10:00:05")] * 2  # FIXTURES.md §6.9
        rows = report_aggregate(report_parse(_raw(spark, lines))).collect()
        assert rows[0]["count"] == 2

    def test_late_split(self, spark):
        lines = [_audit("2018-01-01 10:05:00"), _audit("2018-01-01 10:00:00", typ="black")]
        parsed = report_parse(_raw(spark, lines))
        on_time, late = report_late_split(parsed, F.lit("2018-01-01 10:04:00").cast("timestamp"))
        assert on_time.count() == 1
        late_rows = late.collect()
        assert len(late_rows) == 1
        epoch_ms, typ, area = late_rows[0].value.split("\t")
        assert typ == "black" and area == "AREA_US"
        assert epoch_ms == str(1514800800 * 1000)  # 2018-01-01 10:00:00 UTC


class TestGenerators:
    def test_generated_records_flow_through_both_pipelines(self, spark):
        from datetime import datetime

        from flinkproj_spark.pipelines import (
            clean_transform, report_aggregate, report_parse)
        from flinkproj_spark.sources.dims import dim_area
        from flinkproj_spark.sources.generators import (
            alldata_record, auditlog_record)
        import pyspark.sql.functions as F

        seq = spark.createDataFrame(
            [(i, datetime(2018, 1, 1, 10, 0, i)) for i in range(50)],
            "value long, timestamp timestamp",
        )
        alldata = seq.select(
            alldata_record(F.col("value"), F.col("timestamp")).alias("value"))
        cleaned = clean_transform(alldata, dim_area(spark))
        assert cleaned.count() == 100  # 2 data elements per record
        # every generated record parses and enriches (no null areas:
        # generator countries all map, or fall back to 'other')
        areas = {r.area for r in cleaned.select(
            F.get_json_object("value", "$.area").alias("area")).collect()}
        assert None not in areas

        audit = seq.select(
            auditlog_record(F.col("value"), F.col("timestamp")).alias("value"))
        agg = report_aggregate(report_parse(audit))
        assert agg.agg(F.sum("count")).collect()[0][0] == 50  # nothing dropped
