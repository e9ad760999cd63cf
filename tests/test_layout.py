"""Z-order layout: interleave correctness, multiset preservation, and
the actual row-group pruning win measured from parquet footers."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from webalizer_ray.stages.layout import (
    interleave_bits2, quantize_minmax, row_group_prune_stats,
    zorder_dataset)

SF = "/root/testdata/sf0.001"


def test_interleave_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2 ** 12, 500)
    y = rng.integers(0, 2 ** 12, 500)
    z = interleave_bits2(x, y, bits=12)

    def ref(a, b):
        out = 0
        for i in range(12):
            out |= ((int(a) >> i) & 1) << (2 * i)
            out |= ((int(b) >> i) & 1) << (2 * i + 1)
        return out

    assert z.tolist() == [ref(a, b) for a, b in zip(x, y)]
    # locality sanity: z(0,0)=0, z(1,0)=1, z(0,1)=2, z(3,3)=15
    assert interleave_bits2(np.array([0, 1, 0, 3]),
                            np.array([0, 0, 1, 3]),
                            bits=2).tolist() == [0, 1, 2, 15]


def _events_with_hour() -> pd.DataFrame:
    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "value"])
    df["hour"] = df["ts"].dt.hour.astype(np.int64)
    return df.drop(columns=["ts"])


def test_zorder_preserves_multiset(ray_session):
    df = _events_with_hour()
    out = zorder_dataset(rd.from_pandas(df), "hour", "value",
                         (0, 23), (df["value"].min(), df["value"].max())) \
        .to_pandas()
    a = df.sort_values("event_id", ignore_index=True)
    b = out.sort_values("event_id", ignore_index=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)


def test_zorder_prunes_more_rowgroups_than_single_sort(ray_session,
                                                       tmp_path):
    df = _events_with_hour()
    vlo, vhi = float(df["value"].min()), float(df["value"].max())

    z = zorder_dataset(rd.from_pandas(df), "hour", "value",
                       (0, 23), (vlo, vhi)).to_pandas()
    arrival = df  # as-ingested order (by event_id)

    paths = {}
    for name, frame in [("zorder", z), ("arrival", arrival)]:
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(frame, preserve_index=False),
                       p, row_group_size=64)
        paths[name] = p

    # a 2-D box predicate: morning hours x middle value band
    mid = (vlo + vhi) / 2
    box = {"hour": (6, 11), "value": (vlo, mid)}
    sz = row_group_prune_stats(paths["zorder"], box)
    sa = row_group_prune_stats(paths["arrival"], box)
    assert sz["row_groups"] == sa["row_groups"]
    # arrival order carries no clustering: expect ~zero pruning there,
    # and strictly better pruning from the z-layout
    assert sz["pruned"] > sa["pruned"], (sz, sa)
    assert sz["pruned"] >= sz["row_groups"] // 4, sz


def test_quantize_clamps_and_spreads():
    a = np.array([-5.0, 0.0, 0.5, 1.0, 99.0])
    q = quantize_minmax(a, 0.0, 1.0, bits=4)
    assert q.tolist() == [0, 0, 8, 15, 15]
