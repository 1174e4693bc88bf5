"""Relational / dedup / id-assignment stage tests."""

import datetime

import numpy as np
import pyarrow as pa
import ray.data as rd

from hackathon_pagerank_ray.stages.dedup import (dedup_edges,
                                                 dedup_pages_longer_text,
                                                 dedup_ranks_max)
from hackathon_pagerank_ray.stages.degrees import (dangling_vertices,
                                                   in_degrees, out_degrees)
from hackathon_pagerank_ray.stages.ids import assign_vertex_ids, edges_to_ids
from hackathon_pagerank_ray.stages.relational import (anti_join, distinct,
                                                      inner_join,
                                                      left_join_coalesce,
                                                      minmax_normalize,
                                                      sum_normalize, topk)


def _ds(**cols):
    return rd.from_arrow(pa.Table.from_pydict(cols))


def test_distinct_and_dedup_edges():
    e = _ds(src_url=["a", "a", "b"], dst_url=["b", "b", "c"])
    out = dedup_edges(e).to_pandas().sort_values(["src_url", "dst_url"])
    assert out.values.tolist() == [["a", "b"], ["b", "c"]]


def test_dedup_pages_longer_text_reference_semantics():
    ts = [datetime.datetime(2025, 1, 1, 0, 0, s) for s in range(4)]
    docs = _ds(url=["u", "u", "u", "v"],
               warc_ts=ts,
               text=["short", "the longest text", "mid-length!", "only"],
               lang=["en"] * 4)
    out = dedup_pages_longer_text(docs).to_pandas().set_index("url")
    assert out.loc["u", "text"] == "the longest text"
    assert out.loc["v", "text"] == "only"
    # tie → first seen wins (api/main.py:73-76 strictly-longer replace)
    docs2 = _ds(url=["u", "u"], warc_ts=ts[:2], text=["aaaa", "bbbb"],
                lang=["en"] * 2)
    assert dedup_pages_longer_text(docs2).to_pandas()["text"].iloc[0] == "aaaa"


def test_dedup_ranks_max():
    r = _ds(url=["u", "u", "v"], score=[0.2, 0.5, 0.1])
    out = dedup_ranks_max(r).to_pandas().set_index("url")
    assert out.loc["u", "max(score)"] == 0.5


def test_vertex_ids_dense_and_sorted():
    urls = _ds(url=["b", "a", "c", "a", "b", "c", "c"])
    v = assign_vertex_ids(urls).to_pandas().sort_values("vid")
    assert v["vid"].tolist() == [0, 1, 2]
    assert v["url"].tolist() == ["a", "b", "c"]     # sort-ordered dense ids
    # the small-input single-pass path must produce the identical table
    s = assign_vertex_ids(urls, input_rows_hint=7).to_pandas() \
        .sort_values("vid")
    assert s["vid"].tolist() == [0, 1, 2]
    assert s["url"].tolist() == ["a", "b", "c"]


def test_edges_to_ids_drops_unknown_endpoints():
    v = assign_vertex_ids(_ds(url=["a", "b", "c"]))
    e = _ds(src_url=["a", "b", "zz"], dst_url=["b", "c", "a"])
    out = edges_to_ids(e, v, num_partitions=2).to_pandas()
    assert sorted(map(tuple, out.values.tolist())) == [(0, 1), (1, 2)]
    # the join fallback (vertex table "too big" to broadcast) must agree
    out_join = edges_to_ids(e, v, num_partitions=2,
                            broadcast_max_vertices=0).to_pandas()
    assert (sorted(map(tuple, out_join.values.tolist()))
            == sorted(map(tuple, out.values.tolist())))


def test_degrees_and_dangling():
    e = _ds(src=[0, 0, 1], dst=[1, 2, 2])
    assert out_degrees(e).to_pandas().sort_values("src")["outdeg"].tolist() == [2, 1]
    assert in_degrees(e).to_pandas().sort_values("dst")["indeg"].tolist() == [1, 2]
    v = _ds(vid=[0, 1, 2], url=["a", "b", "c"])
    assert dangling_vertices(v, e, num_partitions=2).to_pandas()["vid"].tolist() == [2]


def test_topk_deterministic():
    ds = _ds(vid=[3, 1, 2, 0], rank=[0.1, 0.4, 0.4, 0.2])
    out = topk(ds, ["rank", "vid"], 3, descending=[True, False]).to_pandas()
    assert out["vid"].tolist() == [1, 2, 0]


def test_joins():
    left = _ds(k=[1, 2, 3], a=["x", "y", "z"])
    right = _ds(k=[2, 3, 4], b=[20.0, 30.0, 40.0])
    inner = inner_join(left, right, on="k", num_partitions=2).to_pandas()
    assert sorted(inner["k"].tolist()) == [2, 3]
    lj = left_join_coalesce(left, right, on="k", fill={"b": 0.0},
                            num_partitions=2).to_pandas().sort_values("k")
    assert lj["b"].tolist() == [0.0, 20.0, 30.0]
    aj = anti_join(left, right, on="k", num_partitions=2).to_pandas()
    assert aj["k"].tolist() == [1]


def test_normalizations():
    ds = _ds(s=[1.0, 2.0, 3.0])
    assert minmax_normalize(ds, "s").to_pandas()["s_norm"].tolist() == [0.0, 0.5, 1.0]
    out = sum_normalize(_ds(s=[1.0, 3.0]), "s").to_pandas()["s"].tolist()
    assert out == [0.25, 0.75]
    # reference guard: span = 1.0 when max == min (api/main.py:117-127)
    flat = minmax_normalize(_ds(s=[2.0, 2.0]), "s").to_pandas()["s_norm"].tolist()
    assert flat == [0.0, 0.0]


def test_sessionize():
    """Gap-based sessionization: boundaries strictly > gap, ties share a
    session, 1-based indices in time order, per-user isolation."""
    from hackathon_pagerank_ray.stages.events import sessionize

    us = 1_000_000
    gap = 60.0  # seconds
    t0 = 1_700_000_000 * us
    rows = {
        "user_id": [1, 1, 1, 1, 2, 2, 3],
        "ts": [
            # user 1: two events 60s apart (== gap -> same session), then a
            # 61s jump (> gap -> new session), then a tie with the previous
            t0, t0 + 60 * us, t0 + 121 * us, t0 + 121 * us,
            # user 2: single events 1h apart -> two singleton sessions
            t0, t0 + 3600 * us,
            # user 3: one event
            t0 + 5 * us,
        ],
    }
    tbl = pa.Table.from_pydict({
        "user_id": pa.array(rows["user_id"], pa.int64()),
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
    })
    out = (sessionize(rd.from_arrow(tbl), gap_sec=gap)
           .to_pandas().sort_values(["user_id", "session_idx"])
           .reset_index(drop=True))
    got = list(map(tuple, out[["user_id", "session_idx", "n_events",
                               "start_us", "end_us"]].values))
    assert got == [
        (1, 1, 2, t0, t0 + 60 * us),
        (1, 2, 2, t0 + 121 * us, t0 + 121 * us),
        (2, 1, 1, t0, t0),
        (2, 2, 1, t0 + 3600 * us, t0 + 3600 * us),
        (3, 1, 1, t0 + 5 * us, t0 + 5 * us),
    ]


def test_asof_join():
    """Backward/forward as-of join: per-key latest right <= left (ties ->
    larger tiebreak id), inner drops unmatched, left keeps them as NA,
    keys with no right rows never cross-match."""
    from hackathon_pagerank_ray.stages.events import asof_join

    us = 1_000_000
    t0 = 1_700_000_000 * us

    def _tbl(ids, users, ts):
        return rd.from_arrow(pa.Table.from_pydict({
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }))

    # user 1: left at t=10 matches right at t=10 (tie with t=10 twice ->
    #   larger event_id wins); left at t=5 matches right at t=3
    # user 2: left at t=7, no right rows at all -> inner drops it
    left = _tbl([100, 101, 200], [1, 1, 2],
                [t0 + 10 * us, t0 + 5 * us, t0 + 7 * us])
    right = _tbl([7, 8, 9], [1, 1, 1],
                 [t0 + 10 * us, t0 + 10 * us, t0 + 3 * us])

    kw = dict(by="user_id", on="ts", left_keep={"event_id": "event_id"},
              right_keep={"event_id": "rid"}, right_t_name="r_t_us")
    out = (asof_join(left, right, how="inner", **kw)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    got = list(map(tuple, out[["event_id", "user_id", "rid",
                               "r_t_us"]].values))
    assert got == [(100, 1, 8, t0 + 10 * us), (101, 1, 9, t0 + 3 * us)]

    lout = (asof_join(left, right, how="left", **kw)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(lout) == 3
    assert bool(lout["rid"].isna().iloc[2])

    # forward: earliest right >= left; tie -> SMALLER event_id wins
    fout = (asof_join(left, right, how="inner", direction="forward", **kw)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    fgot = list(map(tuple, fout[["event_id", "rid", "r_t_us"]].values))
    assert fgot == [(100, 7, t0 + 10 * us), (101, 7, t0 + 10 * us)]


def test_rolling_window_sum():
    """RANGE-window semantics: rows sharing a timestamp are peers (both
    included in each other's window); window closed on both ends."""
    from hackathon_pagerank_ray.stages.events import rolling_window_sum

    us = 1_000_000
    t0 = 1_700_000_000 * us
    tbl = pa.Table.from_pydict({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "rid": pa.array([10, 11, 12, 13, 20], pa.int64()),
        "ts": pa.array([t0, t0 + 5 * us, t0 + 5 * us, t0 + 20 * us, t0],
                       pa.timestamp("us")),
        "v": pa.array([1, 2, 4, 8, 100], pa.int64()),
    })
    out = (rolling_window_sum(rd.from_arrow(tbl), by="k", on="ts",
                              value_col="v", window_us=10 * us, id_col="rid")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    got = dict(zip(out["rid"], out["roll_sum"]))
    # rid 10: just itself; rids 11,12: peers at t+5 -> 1+2+4; rid 13 at
    # t+20: window [t+10, t+20] excludes everything else -> 8
    assert got == {10: 1, 11: 7, 12: 7, 13: 8, 20: 100}


def test_point_in_interval_join():
    """Points land in their containing interval (bounds inclusive);
    points outside every interval drop; keys don't cross-match."""
    from hackathon_pagerank_ray.stages.events import point_in_interval_join

    us = 1_000_000
    t0 = 1_700_000_000 * us
    pts = rd.from_arrow(pa.Table.from_pydict({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "pid": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([t0, t0 + 7 * us, t0 + 11 * us, t0],
                       pa.timestamp("us")),
    }))
    ivs = rd.from_arrow(pa.Table.from_pydict({
        "k": pa.array([1, 1], pa.int64()),
        "iid": pa.array([100, 200], pa.int64()),
        "s": pa.array([t0, t0 + 6 * us], pa.int64()),
        "e": pa.array([t0 + 5 * us, t0 + 10 * us], pa.int64()),
    }))
    out = (point_in_interval_join(pts, ivs, by="k", on="ts",
                                  start_col="s", end_col="e",
                                  point_keep={"pid": "pid"},
                                  interval_keep={"iid": "iid"})
           .to_pandas().sort_values("pid").reset_index(drop=True))
    # pid 1 -> interval 100 (start-inclusive); pid 2 -> 200; pid 3 is past
    # every end; pid 4's key has no intervals
    assert list(map(tuple, out[["pid", "iid"]].values)) == [(1, 100),
                                                            (2, 200)]


def test_grouped_topk():
    from hackathon_pagerank_ray.stages.relational import grouped_topk

    ds = _ds(k=[1, 1, 1, 1, 2], rid=[1, 2, 3, 4, 5],
             v=[5.0, 9.0, 9.0, 1.0, 3.0])
    out = (grouped_topk(ds, by="k", sort_col="v", k=2, tiebreak="rid")
           .to_pandas().sort_values(["k", "rid"]).reset_index(drop=True))
    # ties on v=9.0 break by smaller rid first; k=2 keeps rids 2,3
    assert list(map(tuple, out[["k", "rid"]].values)) == [(1, 2), (1, 3),
                                                          (2, 5)]


def test_parse_pages_actor_mode_matches_tasks_mode():
    """The non-default mode="actors" pool must produce the same parsed
    rows as the default plain-task mode."""
    from hackathon_pagerank_ray.stages.extract_stage import parse_pages
    from hackathon_pagerank_ray.testgen import generate_pages

    pages = rd.from_arrow(generate_pages(60, seed=11))
    cols = ["url", "text", "lang", "links", "indexed"]

    def _norm(ds):
        df = ds.to_pandas()[cols]
        df["links"] = df["links"].map(tuple)
        return df.sort_values(["url", "text"]).reset_index(drop=True)

    got_tasks = _norm(parse_pages(pages, mode="tasks"))
    got_actors = _norm(parse_pages(pages, mode="actors", concurrency=2))
    assert got_tasks.equals(got_actors)


def test_band_join_broadcast_between():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hackathon_pagerank_ray.stages.relational import band_join

    df = pd.DataFrame({"x": [5.0, 25.0, 19.999, 20.0, -3.0, np.nan, 100.0]})
    bands = pd.DataFrame({"label": ["a", "b"],
                          "lo": [0.0, 20.0], "hi": [20.0, 50.0]})
    out = band_join(rd.from_pandas(df).repartition(2), bands, "x").to_pandas()
    got = sorted(zip(out["x"], out["band"]))
    # -3 (below), nan, and 100 (above) drop; boundary 20.0 goes to 'b'
    assert got == [(5.0, "a"), (19.999, "a"), (20.0, "b"), (25.0, "b")]
