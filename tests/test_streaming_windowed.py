"""Watermarked windowed aggregation (streaming/windowed.py): finalized
windows emitted exactly once in append mode; rows later than the
watermark are dropped; the batch plan matches the streaming result for
in-order data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from easy_solr4files_index_spark.streaming.windowed import (
    EVENTS_SCHEMA, stream_windowed_agg, windowed_event_agg)

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    data = [(i, T0 + dt.timedelta(minutes=m), 1, et, v, "{}")
            for i, (m, et, v) in enumerate(rows)]
    return spark.createDataFrame(data, EVENTS_SCHEMA)


def _sink(spark, sink):
    try:
        return sorted(
            ((r["win_start"] - T0).total_seconds() / 60, r["event_type"],
             r["n_events"], r["sum_value"])
            for r in spark.read.parquet(sink).collect())
    except Exception:
        return []


def test_late_rows_dropped_and_windows_finalized_once(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))

    # batch 1: events in windows [0,60) and [60,120); max ts 03:10 puts
    # the watermark at 01:10, finalizing only window [0,60)
    _ev(spark, [(5, "click", 1.0), (20, "click", 2.0), (30, "view", 3.0),
                (70, "click", 4.0), (190, "view", 5.0)]
        ).write.mode("append").parquet(src)
    stream_windowed_agg(spark, src, sink, ckpt,
                        window="1 hour", watermark="2 hours")
    out1 = _sink(spark, sink)
    assert out1 == [(0.0, "click", 2, 3.0), (0.0, "view", 1, 3.0)]

    # batch 2: one LATE click at 00:40 (before the 01:10 watermark —
    # must be dropped, its finalized window is never re-emitted) and one
    # at 05:30 advancing the watermark to 03:30: [60,120) finalizes
    # (WITHOUT the late row); [180,240) ends at 04:00 > 03:30 so it
    # stays open (append emits a window only once its END passes the
    # watermark)
    _ev(spark, [(40, "click", 99.0), (330, "view", 6.0)]
        ).write.mode("append").parquet(src)
    stream_windowed_agg(spark, src, sink, ckpt,
                        window="1 hour", watermark="2 hours")
    out2 = _sink(spark, sink)
    assert out2 == [(0.0, "click", 2, 3.0), (0.0, "view", 1, 3.0),
                    (60.0, "click", 1, 4.0)]
    # the [0,60) click window appears exactly once and still counts 2:
    # the late 99.0-value row never reached it


def test_batch_plan_matches_streaming_for_in_order_data(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("s2", "k2", "c2"))
    rows = [(m, "click", float(m)) for m in range(0, 300, 25)]
    ev = _ev(spark, rows)
    ev.write.mode("append").parquet(src)
    stream_windowed_agg(spark, src, sink, ckpt,
                        window="1 hour", watermark="0 seconds")
    got = _sink(spark, sink)
    want = sorted(
        ((r["win_start"] - T0).total_seconds() / 60, r["event_type"],
         r["n_events"], r["sum_value"])
        for r in windowed_event_agg(ev).collect())
    # append mode withholds the last still-open window; everything
    # emitted must match the batch aggregate exactly
    assert got == [w for w in want if w[0] < max(w0 for w0, *_ in want)]
