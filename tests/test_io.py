"""Format round-trips: parquet -> JSONL/CSV -> Dataset must preserve
values and (via the dtype pin) types."""

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def _events_pd():
    import pyarrow.parquet as pq

    return (
        pq.read_table(f"{SF_DIR}/events.parquet")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def test_jsonl_roundtrip_events(ray_session, tmp_path):
    import ray

    from kgraft import io as kio

    want = _events_pd()
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "ev_jsonl")
    kio.write_jsonl(ds, out)
    back = (
        kio.read_jsonl(out, dtypes={"ts": "datetime64[us]", "event_id": "int64",
                                    "user_id": "int64", "value": "float64"})
        .to_pandas()
        .sort_values("event_id", ignore_index=True)[want.columns]
    )
    assert back["ts"].dtype == want["ts"].astype("datetime64[us]").dtype
    pd.testing.assert_frame_equal(
        back.assign(ts=back["ts"].astype("datetime64[us]")),
        want.assign(ts=want["ts"].astype("datetime64[us]")),
    )


def test_csv_roundtrip_customer(ray_session, tmp_path):
    import ray

    from kgraft import io as kio

    import pyarrow.parquet as pq

    want = (
        pq.read_table(f"{SF_DIR}/customer.parquet")
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    ds = ray.data.read_parquet(f"{SF_DIR}/customer.parquet")
    out = str(tmp_path / "cust_csv")
    kio.write_csv(ds, out)
    back = (
        kio.read_csv(out, dtypes={"c_custkey": "int64", "c_nationkey": "int32",
                                  "c_acctbal": "float64"})
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)[want.columns]
    )
    pd.testing.assert_frame_equal(back, want)


def test_bucketed_layout_shuffle_free_join(ray_session, tmp_path):
    """write_bucketed + copartitioned_join == plain merge, for int and
    string keys, including rows whose key exists on one side only."""
    import ray

    from kgraft.io import copartitioned_join, write_bucketed

    rng = np.random.RandomState(41)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 50, 300).astype("int64"),
            "s": rng.choice(["x", "y", "z"], 300),
            "lv": rng.rand(300),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(25, 75, 120).astype("int64"),
            "rv": rng.rand(120),
        }
    )
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(ray.data.from_pandas(left).repartition(4), ld, "k", num_buckets=8)
    write_bucketed(ray.data.from_pandas(right).repartition(3), rd, "k", num_buckets=8)

    got = (
        copartitioned_join(ld, rd, "k")
        .to_pandas()
        .sort_values(["k", "lv", "rv"], ignore_index=True)
    )
    want = left.merge(right, on="k").sort_values(
        ["k", "lv", "rv"], ignore_index=True
    )
    pd.testing.assert_frame_equal(
        got[["k", "s", "lv", "rv"]], want[["k", "s", "lv", "rv"]],
        check_dtype=False,
    )

    # left join keeps unmatched left rows with null rv
    gl = copartitioned_join(ld, rd, "k", how="left").to_pandas()
    wl = left.merge(right, on="k", how="left")
    assert len(gl) == len(wl)
    assert gl["rv"].isna().sum() == wl["rv"].isna().sum()

    # string-keyed layout round-trips through the string hash path
    ls = left.rename(columns={"s": "key_s"})[["key_s", "lv"]]
    rs = pd.DataFrame({"key_s": ["x", "z", "w"], "tag": [1, 2, 3]})
    lsd, rsd = str(tmp_path / "ls"), str(tmp_path / "rs")
    write_bucketed(ray.data.from_pandas(ls), lsd, "key_s", num_buckets=4)
    write_bucketed(ray.data.from_pandas(rs), rsd, "key_s", num_buckets=4)
    gs = (
        copartitioned_join(lsd, rsd, "key_s")
        .to_pandas()
        .sort_values(["key_s", "lv"], ignore_index=True)
    )
    ws = ls.merge(rs, on="key_s").sort_values(["key_s", "lv"], ignore_index=True)
    pd.testing.assert_frame_equal(
        gs[["key_s", "lv", "tag"]], ws[["key_s", "lv", "tag"]], check_dtype=False
    )


def test_bucketed_layout_manifest_guards(ray_session, tmp_path):
    import pytest
    import ray

    from kgraft.io import copartitioned_join, write_bucketed

    a = pd.DataFrame({"k": np.arange(10, dtype="int64"), "v": np.arange(10)})
    d1, d2, d3 = (str(tmp_path / x) for x in ("a", "b", "c"))
    write_bucketed(ray.data.from_pandas(a), d1, "k", num_buckets=4)
    write_bucketed(
        ray.data.from_pandas(a.rename(columns={"v": "w"})), d2, "k", num_buckets=8
    )
    with pytest.raises(ValueError, match="num_buckets"):
        copartitioned_join(d1, d2, "k")
    write_bucketed(
        ray.data.from_pandas(a.rename(columns={"k": "j", "v": "w"})), d3, "j",
        num_buckets=4,
    )
    with pytest.raises(ValueError, match="bucketed by"):
        copartitioned_join(d1, d3, "k")


def test_bucket_lookup_point_reads(ray_session, tmp_path):
    """bucket_lookup == full-scan filter, including composite keys,
    missing keys, and the empty-probe edge."""
    import ray

    from kgraft.io import bucket_lookup, write_bucketed

    rng = np.random.RandomState(47)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 200, 500).astype("int64"),
            "v": rng.rand(500),
        }
    )
    d = str(tmp_path / "lkp")
    write_bucketed(ray.data.from_pandas(df).repartition(4), d, "k", num_buckets=16)

    probes = [3, 77, 150, 9999]  # 9999 absent
    got = bucket_lookup(d, probes).sort_values(["k", "v"], ignore_index=True)
    want = df[df["k"].isin(probes)].sort_values(["k", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]], check_dtype=False)

    assert bucket_lookup(d, []).empty

    # composite string+int key
    df2 = pd.DataFrame(
        {
            "s": rng.choice(["a", "b", "c"], 300),
            "i": rng.randint(0, 10, 300).astype("int64"),
            "v": rng.rand(300),
        }
    )
    d2 = str(tmp_path / "lkp2")
    write_bucketed(ray.data.from_pandas(df2), d2, ["s", "i"], num_buckets=8)
    got2 = bucket_lookup(d2, [("a", 3), ("c", 7)]).sort_values(
        ["s", "i", "v"], ignore_index=True
    )
    want2 = df2[
        ((df2["s"] == "a") & (df2["i"] == 3)) | ((df2["s"] == "c") & (df2["i"] == 7))
    ].sort_values(["s", "i", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got2[["s", "i", "v"]], want2[["s", "i", "v"]], check_dtype=False
    )


def test_sorted_layout_range_scan(ray_session, tmp_path):
    """write_sorted + range_scan: exact bounds vs brute-force filter,
    zone maps actually prune files, column projection works, and an
    out-of-range scan returns a typed empty dataset."""
    import ray

    from kgraft.io import prune_range_files, range_scan, write_sorted

    rng = np.random.RandomState(8)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 100_000, 20_000).astype("int64"),
            "v": rng.rand(20_000),
            "tag": rng.choice(["x", "y"], 20_000),
        }
    )
    d = str(tmp_path / "sorted_k")
    write_sorted(
        ray.data.from_pandas(df).repartition(16), d, "k"
    )

    kept, total = prune_range_files(d, 40_000, 45_000)
    assert total >= 8 and len(kept) < total  # zone maps pruned something

    got = (
        range_scan(d, 40_000, 45_000)
        .to_pandas()
        .sort_values(["k", "v"], ignore_index=True)
    )
    want = (
        df[(df.k >= 40_000) & (df.k <= 45_000)]
        .sort_values(["k", "v"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "v", "tag"]], want[["k", "v", "tag"]]
    )

    # one-sided + projection (key not in the projected columns)
    got2 = range_scan(d, lo=99_000, columns=["v"]).to_pandas()
    assert len(got2) == int((df.k >= 99_000).sum())
    assert list(got2.columns) == ["v"]

    # fully out of range -> typed empty
    got3 = range_scan(d, lo=200_000).to_pandas()
    assert len(got3) == 0


def test_compact_preserves_rows_and_reduces_files(ray_session, tmp_path):
    import glob

    import numpy as np
    import pandas as pd
    import ray
    from kgraft.io import compact

    df = pd.DataFrame(
        {
            "k": np.arange(5000, dtype=np.int64),
            "s": [f"row-{i}" for i in range(5000)],
        }
    )
    frag_dir = str(tmp_path / "frags")
    ray.data.from_pandas(df).repartition(40).write_parquet(frag_dir)
    assert len(glob.glob(frag_dir + "/*.parquet")) >= 30

    out_dir = str(tmp_path / "compacted")
    stats = compact(frag_dir, out_dir, target_mb=128)
    assert stats["n_rows"] == 5000
    assert stats["n_files_out"] < stats["n_files_in"]
    assert stats["n_files_out"] <= 2

    got = (
        ray.data.read_parquet(out_dir)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, df)

    import pytest

    with pytest.raises(ValueError):
        compact(frag_dir, frag_dir)
    with pytest.raises(ValueError):
        compact(str(tmp_path / "nope"), out_dir)


def test_write_partitioned_pruned_read(ray_session, tmp_path):
    import glob

    import numpy as np
    import pandas as pd
    import ray
    from kgraft.io import read_partition, write_partitioned

    df = pd.DataFrame(
        {
            "k": np.arange(900, dtype=np.int64),
            "lang": np.array(["en", "de", "fr"])[np.arange(900) % 3],
            "v": np.arange(900, dtype=np.float64) * 0.5,
        }
    )
    out = str(tmp_path / "by_lang")
    write_partitioned(ray.data.from_pandas(df).repartition(4), out, by="lang")
    assert sorted(glob.glob(out + "/lang=*")) == [
        out + "/lang=de",
        out + "/lang=en",
        out + "/lang=fr",
    ]

    got = (
        read_partition(out, "lang", ["de", "fr"])
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = (
        df[df["lang"].isin(["de", "fr"])]
        .sort_values("k", ignore_index=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want)

    # column pruning without the partition column
    got2 = read_partition(out, "lang", "en", columns=["k", "v"]).to_pandas()
    assert sorted(got2.columns) == ["k", "v"]
    assert len(got2) == 300

    import pytest

    with pytest.raises(ValueError):
        read_partition(out, "lang", ["zz"])


def test_read_evolved_union_schema(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    from kgraft.io import read_evolved

    old = pd.DataFrame(
        {"k": np.arange(5, dtype=np.int64), "a": ["x"] * 5}
    )
    new = pd.DataFrame(
        {
            "k": np.arange(5, 9, dtype=np.int64),
            "a": ["y"] * 4,
            "b": np.arange(4, dtype=np.float64),
        }
    )
    d_old, d_new = str(tmp_path / "old"), str(tmp_path / "new")
    ray.data.from_pandas(old).write_parquet(d_old)
    ray.data.from_pandas(new).write_parquet(d_new)

    got = (
        read_evolved([d_old, d_new])
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert list(got.columns) == ["k", "a", "b"]
    assert got["b"].isna().sum() == 5  # old snapshot's rows are null
    assert got.loc[got["k"] >= 5, "b"].tolist() == [0.0, 1.0, 2.0, 3.0]

    # column projection incl. a column one snapshot lacks
    got2 = read_evolved([d_old, d_new], columns=["k", "b"]).to_pandas()
    assert sorted(got2.columns) == ["b", "k"]
    assert len(got2) == 9

    # requesting only a column the old snapshot lacks still yields its rows
    got3 = read_evolved([d_old, d_new], columns=["b"]).to_pandas()
    assert len(got3) == 9 and got3["b"].isna().sum() == 5

    # type conflict fails fast
    bad = pd.DataFrame({"k": ["s1", "s2"], "a": ["z"] * 2})
    d_bad = str(tmp_path / "bad")
    ray.data.from_pandas(bad).write_parquet(d_bad)
    import pytest

    with pytest.raises(ValueError, match="type conflict"):
        read_evolved([d_old, d_bad])
    with pytest.raises(ValueError, match="unknown column"):
        read_evolved([d_old, d_new], columns=["zzz"])


def test_zorder_layout_prunes_both_dims_and_scans_exact(ray_session, tmp_path):
    import ray

    from kgraft.io import write_zorder, zorder_scan

    rng = np.random.RandomState(17)
    n = 40_000
    df = pd.DataFrame(
        {
            "x": rng.randint(0, 1000, n).astype("int64"),
            "y": rng.randint(0, 1000, n).astype("int64"),
            "v": rng.rand(n),
        }
    )
    out = str(tmp_path / "zl")
    write_zorder(
        ray.data.from_pandas(df).repartition(16), out, on=("x", "y")
    )
    ds, kept, total = zorder_scan(
        out, {"x": (100, 199), "y": (300, 399)}, columns=["x", "y", "v"]
    )
    got = ds.to_pandas().sort_values(["x", "y", "v"], ignore_index=True)
    want = (
        df[(df.x >= 100) & (df.x <= 199) & (df.y >= 300) & (df.y <= 399)]
        .sort_values(["x", "y", "v"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # a 1% rectangle must not read the whole layout: BOTH dims prune
    assert total >= 8 and kept < total, (kept, total)
    # half-open bounds and single-dim prune also work
    ds2, kept2, _ = zorder_scan(out, {"y": (None, 49)}, columns=["y"])
    assert ds2.to_pandas()["y"].max() <= 49
    assert kept2 < total


def test_inverted_index_bucketed_layout_prunes_and_reads_back(ray_session):
    """inverted_index_docs writes its postings through write_bucketed
    (the operational sink — r4 VERDICT next #2): every bucket file
    holds only tokens hashing to that bucket, and the layout readback
    IS the query result."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgraft.io import _load_bucket_manifest
    from kgraft.queries import _scratch_layout, inverted_index_docs
    from kgraft.relational import join_key_hash

    sf_dir = "/root/testdata/sf0.001"
    out = inverted_index_docs(sf_dir)
    assert len(out) > 0 and list(out.columns) == ["token", "doc_id", "tf"]

    layout = _scratch_layout(sf_dir, "inverted_index")
    man = _load_bucket_manifest(layout)
    assert man["key"] == ["token"] and man["num_buckets"] == 32

    seen = 0
    for f in glob.glob(os.path.join(layout, "**", "*.parquet"), recursive=True):
        b = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        t = pq.read_table(f, columns=["token"])
        h = join_key_hash(t, ["token"], int_keys=False)
        assert (h % np.uint64(32) == b).all(), f
        seen += len(t)
    assert seen == len(out)  # the layout IS the result — nothing extra
