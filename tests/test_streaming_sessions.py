"""applyInPandasWithState gap-sessionization.

- in-batch + timer-closed sessions must match an independent Python
  sessionizer, including open tails surviving in state and closing via
  event-time timers across checkpoint restarts;
- late-but-within-watermark events arriving in a LATER micro-batch
  (older than the open session's start) must land in the right session
  (the fragment-buffer redesign; old versions emitted gap-closed
  sessions before the watermark guaranteed finality);
- streaming output must equal the batch sessionizer on the same events
  fed through a multi-batch split with a checkpoint restart (VERDICT
  r02 #7).
"""

import shutil

import pandas as pd
import pytest

from tabular_data_semantics_py_spark.streaming.events import (
    stream_events_from_parquet,
)
from tabular_data_semantics_py_spark.streaming.sessions import (
    _merge_fragments,
    sessionize_batch,
    sessionize_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP_MS = 30 * 60 * 1000
MIN = 60 * 1000


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


def _events_pdf(rows: list[tuple]) -> pd.DataFrame:
    """rows: (event_id, user_id, ts_ms). us resolution: Spark's parquet
    reader rejects TIMESTAMP(NANOS), which pandas would otherwise
    write."""
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[2] * 10**6 for r in rows]).astype(
                "datetime64[us]"
            ),
            "user_id": [r[1] for r in rows],
            "event_type": ["e"] * len(rows),
            "value": [0.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )


@pytest.fixture()
def dirs(tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(EVENTS, d / "part-0.parquet")
    return str(d), str(tmp_path / "ckpt")


def _run(spark, src_dir, ckpt):
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
    assert q.awaitTermination(300), "availableNow query did not finish"
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }


def test_merge_fragments_is_exact():
    """Interval merging of fragments ≡ full-sort sessionization, for
    every way of batching the events (the claim the state design rests
    on)."""
    import itertools
    import random

    rng = random.Random(7)
    for _ in range(200):
        ts = sorted(rng.randrange(0, 40) * MIN for _ in range(rng.randrange(1, 9)))
        expect = _py_sessions(
            pd.DataFrame(
                {
                    "user_id": ["u"] * len(ts),
                    "ts": pd.to_datetime([t * 10**6 for t in ts]),
                }
            )
        )
        expect = [(s, e, n) for (_, s, e, n) in expect]
        order = ts[:]
        rng.shuffle(order)
        cuts = sorted(rng.sample(range(len(order) + 1), rng.randrange(0, 3)))
        frags: list = []
        for lo, hi in itertools.pairwise([0, *cuts, len(order)]):
            frags = _merge_fragments(
                frags + [(t, t, 1) for t in order[lo:hi]], GAP_MS
            )
        assert frags == sorted(expect), (ts, cuts)


def test_closures_match_python_oracle(spark, dirs):
    src, ckpt = dirs
    got = _run(spark, src, ckpt)

    pdf = pd.read_parquet(EVENTS)
    all_sessions = _py_sessions(pdf)
    # sessions emit only once the final watermark (global max ts - 2 h)
    # passes end + gap (availableNow runs the extra no-data batch that
    # fires due timers); later sessions stay open in state
    wm = (
        int(pdf["ts"].astype("datetime64[ns]").astype("int64").max() // 10**6)
        - 2 * 3600 * 1000
    )
    still_open = {s for s in all_sessions if s[2] + GAP_MS >= wm}
    assert got == set(all_sessions) - still_open


def test_timeout_closes_tail_sessions(spark, dirs):
    src, ckpt = dirs
    p1 = _run(spark, src, ckpt)

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
        _events_pdf([(10_000_000 + i, 999_999, far + off)]).to_parquet(
            f"{src}/late-{i}.parquet"
        )
        p1 |= _run(spark, src, ckpt)

    # every phase-1 session (including the open tails) must now be
    # emitted exactly as the independent sessionizer computes them
    phase1 = {s for s in p1 if s[1] < far}
    assert phase1 == set(all_sessions)


def test_late_event_joins_earlier_session(spark, tmp_path):
    """An event arriving one micro-batch later, OLDER than the open
    session's start but inside the watermark, must extend/prepend the
    session it belongs to (and can even bridge two fragments)."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    t0 = 1_600_000_000_000

    # batch 1: u1 has two fragments 40 min apart (separate sessions so
    # far); u2 one event
    _events_pdf(
        [
            (1, 1, t0),
            (2, 1, t0 + 10 * MIN),
            (3, 1, t0 + 50 * MIN),
            (4, 2, t0 + 20 * MIN),
        ]
    ).to_parquet(str(src / "b1.parquet"))
    got = _run(spark, str(src), ckpt)
    assert got == set()  # watermark hasn't passed anything yet

    # batch 2: a LATE event at t0+30min bridges u1's fragments into ONE
    # session; u2 gets a pre-start event at t0+5min (watermark after
    # batch 1 is t0+50min-2h, far earlier — both are within horizon)
    _events_pdf(
        [(5, 1, t0 + 30 * MIN), (6, 2, t0 + 5 * MIN)]
    ).to_parquet(str(src / "b2.parquet"))
    # batch 3: far-future tick closes everything
    far = t0 + 30 * 24 * 3600 * 1000
    for i, off in enumerate((0, GAP_MS * 10)):
        _events_pdf([(100 + i, 999, far + off)]).to_parquet(
            str(src / f"tick-{i}.parquet")
        )
        got |= _run(spark, str(src), ckpt)

    real = {s for s in got if s[0] != "999"}
    assert real == {
        ("1", t0, t0 + 50 * MIN, 4),
        ("2", t0 + 5 * MIN, t0 + 20 * MIN, 2),
    }


def test_batch_streaming_equivalence(spark, tmp_path):
    """The strongest statement for the custom stateful operator: the
    same event set, split into multiple micro-batches ACROSS a
    checkpoint restart with a deterministic subset delivered late (but
    within watermark), yields exactly the batch sessionizer's rows."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ck")

    pdf = pd.read_parquet(EVENTS)
    ms = pdf["ts"].astype("datetime64[ns]").astype("int64") // 10**6
    t_cut = int(ms.quantile(0.5))
    # phase 1: ts < cut, minus a held-out subset from the last hour
    # before the cut (those arrive late in phase 2, within the 2 h
    # watermark computed from phase 1's max)
    held = (ms >= t_cut - 3600 * 1000) & (ms < t_cut) & (pdf["event_id"] % 7 == 0)
    p1 = pdf[(ms < t_cut) & ~held]
    p2 = pdf[(ms >= t_cut) | held]
    assert held.sum() > 0 and len(p1) > 0 and len(p2) > 0
    p1.to_parquet(str(src / "phase1.parquet"))
    got = _run(spark, str(src), ckpt)  # restart boundary after this
    p2.to_parquet(str(src / "phase2.parquet"))
    got |= _run(spark, str(src), ckpt)

    far = int(ms.max()) + 30 * 24 * 3600 * 1000
    for i, off in enumerate((0, GAP_MS * 10)):
        _events_pdf([(20_000_000 + i, 999_999, far + off)]).to_parquet(
            str(src / f"tick-{i}.parquet")
        )
        got |= _run(spark, str(src), ckpt)

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(
            spark.read.parquet(EVENTS)
        ).collect()
    }
    assert {s for s in got if s[0] != "999999"} == batch


class _FakeState:
    """Minimal GroupState stand-in for driving make_sessionizer."""

    def __init__(self, wm_ms):
        self._wm = wm_ms
        self._val = None
        self.timeout = None
        self.removed = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def getCurrentWatermarkMs(self):
        return self._wm

    def update(self, v):
        self._val = v

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts

    def remove(self):
        self.removed = True


def test_sessionizer_watermark_comparison_in_non_utc_tz():
    """applyInPandasWithState hands event time to pandas as
    SESSION-LOCAL naive values while getCurrentWatermarkMs() is true
    UTC epoch ms. In a non-UTC session the sessionizer must localize
    before comparing — the old code closed sessions hours early
    (local-wall ms vs UTC watermark)."""
    from tabular_data_semantics_py_spark.streaming.sessions import (
        make_sessionizer,
    )

    # 2021-01-15 12:00 PST == 2021-01-15 20:00 UTC
    true_epoch = int(
        pd.Timestamp("2021-01-15 20:00:00", tz="UTC").value // 10**6
    )
    local_naive = pd.Timestamp("2021-01-15 12:00:00")  # what pandas sees
    wm = true_epoch - 60 * 60 * 1000  # watermark 1h BEFORE the event

    fn = make_sessionizer(gap_min=30, tz="America/Los_Angeles")
    state = _FakeState(wm)
    pdf = pd.DataFrame({"ts": [local_naive]})
    out = list(fn(("u1",), iter([pdf]), state))

    # the event is inside the watermark horizon: it must stay OPEN
    # (the un-localized comparison would see end+gap 8h < wm and emit)
    assert out == []
    assert state.exists
    starts, ends, ns = state.get
    assert ends[0] == true_epoch  # stored as true epoch ms


def test_batch_sessionizer_emits_true_epoch_in_non_utc_tz(spark):
    """sessionize_batch must emit TRUE UTC epoch ms (what the stream
    path emits) in any session timezone — a timestamp_ntz wall-clock
    reinterpretation would shift the output by the zone offset and
    merge DST fall-back repeats."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        ev = spark.createDataFrame(
            [(1, "2021-01-15 12:00:00"), (1, "2021-01-15 12:10:00")],
            "user_id long, ts string",
        )
        rows = sessionize_batch(ev, gap_min=30).collect()
        # 12:00 IST == 06:30 UTC
        want = int(
            pd.Timestamp("2021-01-15 06:30:00", tz="UTC").value // 10**6
        )
        assert len(rows) == 1
        assert rows[0].session_start == want
        assert rows[0].session_end == want + 10 * 60 * 1000
        assert rows[0].n_events == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
