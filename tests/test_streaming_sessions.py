"""applyInPandasWithState gap-sessionization: in-batch closures must
match an independent Python sessionizer; the open tail session must
survive in state and close via event-time timeout once the watermark
passes (state continuity across restarts from the same checkpoint)."""

import shutil

import pandas as pd
import pyspark.sql.functions as F
import pytest

from tabular_data_semantics_py_spark.streaming.events import (
    stream_events_from_parquet,
)
from tabular_data_semantics_py_spark.streaming.sessions import (
    sessionize_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP_MS = 30 * 60 * 1000


def _py_sessions(pdf: pd.DataFrame) -> list[tuple]:
    """Independent sessionizer: (user_id str, start_ms, end_ms, n)."""
    out = []
    ms = pdf["ts"].astype("datetime64[ns]").astype("int64") // 10**6
    for uid, grp in ms.groupby(pdf["user_id"]):
        cur = None
        for t in sorted(grp.tolist()):
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] <= GAP_MS:
                cur = [cur[0], max(cur[1], t), cur[2] + 1]
            else:
                out.append((str(uid), cur[0], cur[1], cur[2]))
                cur = [t, t, 1]
        if cur is not None:
            out.append((str(uid), cur[0], cur[1], cur[2]))
    return out


@pytest.fixture()
def dirs(tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(EVENTS, d / "part-0.parquet")
    return str(d), str(tmp_path / "ckpt")


def _run(spark, src_dir, ckpt, name):
    # parquet sink: recoverable from the checkpoint across restarts
    # (the memory sink is not), so later phases continue the same state
    out = ckpt + "_out"
    stream = sessionize_stream(stream_events_from_parquet(spark, src_dir))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }


def test_closures_match_python_oracle(spark, dirs):
    src, ckpt = dirs
    got = _run(spark, src, ckpt, "sess_p1")

    pdf = pd.read_parquet(EVENTS)
    all_sessions = _py_sessions(pdf)
    # gap-closed sessions emit in-batch; each user's open tail emits
    # via event-time timer once the final watermark (global max ts -
    # 2 h) passes its end + gap (availableNow runs the extra no-data
    # batch that fires due timers)
    wm = (
        int(pdf["ts"].astype("datetime64[ns]").astype("int64").max() // 10**6)
        - 2 * 3600 * 1000
    )
    last_per_user = {}
    for s in all_sessions:
        if s[0] not in last_per_user or s[1] > last_per_user[s[0]][1]:
            last_per_user[s[0]] = s
    still_open = {
        s for s in last_per_user.values() if s[2] + GAP_MS >= wm
    }
    assert got == set(all_sessions) - still_open


def test_timeout_closes_tail_sessions(spark, dirs):
    src, ckpt = dirs
    p1 = _run(spark, src, ckpt, "sess_t1")

    base = pd.read_parquet(EVENTS)
    all_sessions = _py_sessions(base)
    far = (
        int(base["ts"].astype("datetime64[ns]").astype("int64").max() // 10**6)
        + 30 * 24 * 3600 * 1000
    )

    # two more batches: the first advances the watermark far past every
    # open session's timeout; the second lets the engine process the
    # now-expired timers (event-time timeouts fire against the
    # watermark computed from the *previous* batch)
    for i, off in enumerate((0, GAP_MS * 10)):
        pdf = pd.DataFrame(
            {
                "event_id": [10_000_000 + i],
                # us resolution: Spark's parquet reader rejects
                # TIMESTAMP(NANOS), which pandas would otherwise write
                "ts": pd.to_datetime([(far + off) * 10**6]).astype(
                    "datetime64[us]"
                ),
                "user_id": [999_999],
                "event_type": ["tick"],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        pdf.to_parquet(f"{src}/late-{i}.parquet")
        p1 |= _run(spark, src, ckpt, f"sess_t2_{i}")

    # every phase-1 session (including the open tails) must now be
    # emitted exactly as the independent sessionizer computes them
    phase1 = {s for s in p1 if s[1] < far}
    assert phase1 == set(all_sessions)
