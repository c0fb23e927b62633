"""Streaming twins: the same cores under Structured Streaming converge
to the batch result (SURVEY.md §5.2.3), late data is upserted or split."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from flinkproj_spark.pipelines import report_aggregate, report_parse
from flinkproj_spark.sources.dims import dim_area
from flinkproj_spark.streaming.pipelines import (
    stream_clean,
    stream_report,
    stream_report_with_late_split,
)


def _audit(dt, typ="shelf", area="AREA_US"):
    return json.dumps({"dt": dt, "type": typ, "username": "u", "area": area})


def _write_lines(spark, path, lines, name="part0"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"{name}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _read_stream(spark, path):
    return spark.readStream.format("text").load(path).withColumnRenamed("value", "value")


class TestStreamReport:
    def test_converges_to_batch(self, spark, tmp_path):
        lines = [
            _audit("2018-01-01 10:00:05"),
            _audit("2018-01-01 10:00:29"),
            _audit("2018-01-01 10:00:31", typ="black"),
            _audit("2018-13-99 xx"),  # dropped by parse
        ]
        src, res, late, ckpt = (str(tmp_path / d) for d in ("src", "res", "late", "ckpt"))
        _write_lines(spark, src, lines)
        q = stream_report(spark, _read_stream(spark, src), res, late, ckpt)
        q.awaitTermination(120)

        got = spark.read.parquet(res).drop("kb")
        batch = report_aggregate(report_parse(
            spark.createDataFrame([(l,) for l in lines], "value string")))
        assert sorted(map(tuple, got.select(*batch.columns).collect())) == sorted(
            map(tuple, batch.collect())
        )

    def test_late_record_upserts(self, spark, tmp_path):
        src, res, late, ckpt = (str(tmp_path / d) for d in ("src", "res", "late", "ckpt"))
        _write_lines(spark, src, [_audit("2018-01-01 10:00:05")], "b0")
        q = stream_report(spark, _read_stream(spark, src), res, late, ckpt)
        q.awaitTermination(120)
        # batch 2: a second record in the SAME window arrives later but
        # within the 40 s watermark → window re-fires, upsert overwrites
        _write_lines(spark, src, [_audit("2018-01-01 10:00:10"),
                                  _audit("2018-01-01 10:00:45")], "b1")
        q = stream_report(spark, _read_stream(spark, src), res, late, ckpt)
        q.awaitTermination(120)

        rows = {r.doc_id: r for r in spark.read.parquet(res).collect()}
        first_window = rows["2018-01-01_10:00:10-shelf-AREA_US"]
        assert first_window["count"] == 2  # corrected result, not 1

    def test_late_split_side_output(self, spark, tmp_path):
        src, res, late, ckpt = (str(tmp_path / d) for d in ("src", "res", "late", "ckpt"))
        _write_lines(spark, src, [_audit("2018-01-01 10:10:00")], "b0")
        q = stream_report_with_late_split(spark, _read_stream(spark, src), res, late, ckpt)
        q.awaitTermination(120)
        # > 40 s older than max seen event time → late channel (W4)
        _write_lines(spark, src, [_audit("2018-01-01 10:00:00", typ="black")], "b1")
        q = stream_report_with_late_split(spark, _read_stream(spark, src), res, late, ckpt)
        q.awaitTermination(120)

        late_lines = [r.value for r in spark.read.text(late).collect()]
        assert any("black" in l for l in late_lines)
        res_types = {r.type for r in spark.read.parquet(res).collect()}
        assert "black" not in res_types  # late record kept out of results


class TestStreamClean:
    def test_clean_stream_with_dim_reload(self, spark, tmp_path):
        lines = [json.dumps({
            "dt": "2018-01-01 11:11:11", "countryCode": "TW",
            "data": [{"type": "s1", "score": 0.3, "level": "A"}],
        })]
        src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
        _write_lines(spark, src, lines)
        q = stream_clean(spark, _read_stream(spark, src), dim_area, out, ckpt)
        q.awaitTermination(120)
        recs = [json.loads(r.value) for r in spark.read.parquet(out).collect()]
        assert recs == [{"type": "s1", "score": 0.3, "level": "A",
                         "area": "AREA_CT", "dt": "2018-01-01 11:11:11"}]


class TestStatefulSessionize:
    def _feed(self, spark, src, rows, name):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(src)

    def test_sessions_close_on_gap_and_converge_to_batch(self, spark, tmp_path):
        from datetime import datetime, timedelta

        from flinkproj_spark.streaming.stateful import stream_sessionize

        t0 = datetime(2018, 1, 1, 10, 0, 0)
        m = timedelta(minutes=1)
        # user 1: two sessions (gap 40 min); user 2: one session; then a
        # far-future closer event per user forces the open session shut
        # in-stream (deterministic — no reliance on timeout firing).
        batch1 = [(1, t0), (1, t0 + 2 * m), (2, t0 + m)]
        batch2 = [(1, t0 + 45 * m), (2, t0 + 10 * m)]
        closer = [(u, t0 + timedelta(hours=5)) for u in (1, 2)]

        src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
        for i, rows in enumerate((batch1, batch2, closer)):
            self._feed(spark, src, rows, f"b{i}")

        events = spark.readStream.schema("user_id long, ts timestamp").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_sessionize(events)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out).collect()
        }
        assert (1, t0, t0 + 2 * m, 2) in got          # first session of user 1
        assert (1, t0 + 45 * m, t0 + 45 * m, 1) in got  # second session of user 1
        assert (2, t0 + m, t0 + 10 * m, 2) in got       # user 2's one session

    def test_state_survives_restart(self, spark, tmp_path):
        from datetime import datetime, timedelta

        from flinkproj_spark.streaming.stateful import stream_sessionize

        t0 = datetime(2018, 1, 1, 10, 0, 0)
        src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

        def run():
            events = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
            q = (
                stream_sessionize(events)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        self._feed(spark, src, [(7, t0), (7, t0 + timedelta(minutes=5))], "b0")
        run()  # session is open in state; nothing emitted yet
        self._feed(spark, src, [(7, t0 + timedelta(hours=2))], "b1")
        run()  # restart from checkpoint; the gap closes the old session

        rows = spark.read.parquet(out).collect()
        assert (7, t0, t0 + timedelta(minutes=5), 2) in {
            (r.user_id, r.session_start, r.session_end, r.n_events) for r in rows
        }
