"""dataset_profile / grouped_mode vs brute-force pandas oracles on
seeded random data (both ops are deterministic: exact frame equality),
on both the gather and the forced-shuffle paths."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.ops.profile import (
    dataset_profile,
    grouped_mode,
)

SHUFFLE_CFG = EngineConfig(gather_max_keys=0)
GATHER_CFG = EngineConfig(gather_max_keys=10**6)


def _table(n=400, seed=7):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame({
        "uid": rng.randint(0, 17, n).astype(np.int64),
        "cents": rng.randint(-5000, 50000, n).astype(np.int64),
        "score": rng.rand(n).round(4),
        "kind": rng.choice(["click", "view", "error", "purchase"], n),
    })
    # plant NULLs in every family
    df.loc[df.index[::17], "score"] = np.nan
    df["kind"] = df["kind"].astype(object)
    df.loc[df.index[::23], "kind"] = None
    return df


def test_profile_matches_pandas(ray_session):
    df = _table()
    res = dataset_profile(
        rd.from_pandas(df).repartition(6),
        int_cols=["uid", "cents"], float_cols=["score"],
        str_cols=["kind"]).to_pandas().set_index("column")

    assert sorted(res.index) == ["cents", "kind", "score", "uid"]
    for c in ["uid", "cents", "score", "kind"]:
        assert res.loc[c, "n_rows"] == len(df)
        assert res.loc[c, "n_null"] == int(df[c].isna().sum())
    for c in ["uid", "cents"]:
        assert res.loc[c, "min_num"] == float(df[c].min())
        assert res.loc[c, "max_num"] == float(df[c].max())
        assert res.loc[c, "sum_int"] == df[c].sum()
    assert res.loc["score", "min_num"] == df["score"].min()
    assert res.loc["score", "max_num"] == df["score"].max()
    assert pd.isna(res.loc["score", "sum_int"])
    kd = df["kind"].dropna()
    assert res.loc["kind", "min_str"] == kd.min()
    assert res.loc["kind", "max_str"] == kd.max()
    assert pd.isna(res.loc["kind", "min_num"])


def test_profile_single_block_equals_multi(ray_session):
    df = _table(seed=3)
    kw = dict(int_cols=["cents"], float_cols=["score"], str_cols=["kind"])
    a = dataset_profile(rd.from_pandas(df), **kw).to_pandas()
    b = dataset_profile(rd.from_pandas(df).repartition(9), **kw).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("column").reset_index(drop=True),
        b.sort_values("column").reset_index(drop=True))


def test_profile_empty_and_all_null(ray_session):
    df = pd.DataFrame({"x": pd.Series([None] * 5, dtype="float64"),
                       "s": pd.Series([None] * 5, dtype=object)})
    res = dataset_profile(rd.from_pandas(df), float_cols=["x"],
                          str_cols=["s"]).to_pandas().set_index("column")
    assert res.loc["x", "n_null"] == 5
    assert pd.isna(res.loc["x", "min_num"])
    assert res.loc["s", "n_null"] == 5
    assert pd.isna(res.loc["s", "max_str"])


def _mode_oracle(df, key, col):
    d = df.groupby([key, col]).size().rename("n").reset_index()
    d = d.sort_values([key, "n", col], ascending=[True, False, True],
                      kind="stable")
    top = d.drop_duplicates(subset=[key], keep="first")
    return pd.DataFrame({key: top[key].to_numpy(),
                         "mode_value": top[col].to_numpy(),
                         "n": top["n"].to_numpy(np.int64)})


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_grouped_mode(ray_session, cfg):
    df = _table(n=600, seed=11).dropna(subset=["kind"])
    res = grouped_mode(rd.from_pandas(df).repartition(7),
                       key="uid", col="kind", cfg=cfg,
                       n_rows=len(df)).to_pandas()
    exp = _mode_oracle(df, "uid", "kind")
    pd.testing.assert_frame_equal(
        res.sort_values("uid").reset_index(drop=True),
        exp.sort_values("uid").reset_index(drop=True))


def test_binned_histogram(ray_session):
    from aml_entity_resolution_assignment_ray.ops.profile import (
        binned_histogram,
    )

    rng = np.random.RandomState(2)
    # negative values exercise FLOOR (not truncating) division
    df = pd.DataFrame({"v": rng.randint(-95, 300, 500).astype(np.int64)})
    res = binned_histogram(rd.from_pandas(df).repartition(5),
                           col="v", bin_width=100).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    exp = (df["v"] // 100).value_counts().sort_index()
    assert list(res["bin"]) == list(exp.index)
    assert list(res["n"]) == list(exp.values)
    assert (res["lo"] == res["bin"] * 100).all()
    assert (res["hi"] == (res["bin"] + 1) * 100).all()
    assert res["bin"].min() == -1  # the negative bin exists

    with pytest.raises(ValueError):
        binned_histogram(rd.from_pandas(df), col="v", bin_width=0)


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_grouped_distinct_count(ray_session, cfg):
    from aml_entity_resolution_assignment_ray.ops.profile import (
        grouped_distinct_count,
    )

    df = _table(n=500, seed=13)
    res = grouped_distinct_count(
        rd.from_pandas(df).repartition(6), key="uid", col="cents",
        cfg=cfg, n_rows=len(df)).to_pandas().sort_values("uid") \
        .reset_index(drop=True)
    exp = df.groupby("uid")["cents"].nunique().rename("n_distinct") \
        .reset_index()
    pd.testing.assert_frame_equal(res, exp, check_dtype=False)
    assert res["n_distinct"].dtype == np.int64


def test_grouped_entropy(ray_session):
    from aml_entity_resolution_assignment_ray.ops.profile import (
        grouped_entropy,
    )

    df = _table(n=500, seed=19).dropna(subset=["kind"])
    res = grouped_entropy(rd.from_pandas(df).repartition(5),
                          key="uid", col="kind", cfg=SHUFFLE_CFG) \
        .to_pandas().sort_values("uid").reset_index(drop=True)

    def ent(s):
        p = s.value_counts().sort_index().to_numpy(np.float64)
        p = p / p.sum()
        return round(float(-(p * np.log(p)).sum()), 6)

    exp = df.groupby("uid")["kind"].apply(ent)
    assert np.allclose(res["entropy"].to_numpy(), exp.to_numpy())
    # a single-value group has zero entropy
    one = grouped_entropy(
        rd.from_pandas(pd.DataFrame({"k": [1, 1], "v": ["a", "a"]})),
        key="k", col="v", cfg=SHUFFLE_CFG).to_pandas()
    assert list(one["entropy"]) == [0.0]


def test_grouped_mode_tie_breaks_to_smallest(ray_session):
    df = pd.DataFrame({"k": [1, 1, 1, 1], "v": ["b", "a", "b", "a"]})
    res = grouped_mode(rd.from_pandas(df), key="k", col="v",
                       cfg=SHUFFLE_CFG).to_pandas()
    assert list(res["mode_value"]) == ["a"]
    assert list(res["n"]) == [2]


@pytest.mark.parametrize("cfg", [SHUFFLE_CFG, GATHER_CFG])
def test_mad_outliers(ray_session, cfg):
    """MAD flags == brute-force discrete-median computation; a planted
    far point is flagged, the heavy bulk is not."""
    from aml_entity_resolution_assignment_ray.ops.profile import (
        mad_outliers,
    )

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 300),
        "id": np.arange(300, dtype=np.int64),
        "v": rng.randint(90, 110, 300).astype(np.int64),
    })
    df.loc[0, ["k", "v"]] = ["a", 10_000]      # planted outlier

    got = mad_outliers(rd.from_pandas(df).repartition(4), key="k",
                       col="v", mult=3, cfg=cfg, n_rows=len(df)) \
        .to_pandas().sort_values("id").reset_index(drop=True)

    def disc_med(s):
        a = np.sort(s.to_numpy())
        return int(a[int(np.ceil(0.5 * len(a))) - 1])

    for kk, grp in df.groupby("k"):
        med = disc_med(grp["v"])
        mad = disc_med((grp["v"] - med).abs())
        sub = got[got["k"] == kk]
        assert (sub["med"] == med).all() and (sub["mad"] == mad).all()
        exp_flag = ((grp.sort_values("id")["v"] - med).abs()
                    > 3 * mad).astype(np.int64)
        assert (sub.sort_values("id")["is_outlier"].to_numpy()
                == exp_flag.to_numpy()).all()
    assert got.loc[got["id"] == 0, "is_outlier"].iloc[0] == 1
    assert got["is_outlier"].sum() <= 5


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_jaccard():
    """Known overlaps on a hand-built set system, and invariance to
    duplicates and repartitioning."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.profile import (
        cooccurrence_jaccard,
    )

    # sets: x={1,2,3}, y={2,3,4}, z={9} -> J(x,y)=2/4, z isolated
    df = pd.DataFrame({
        "s": [1, 2, 3, 2, 3, 4, 9, 1, 2],       # dup (x,1), (y,2)
        "i": list("xxxyyyzxy"),
    })
    got = cooccurrence_jaccard(
        rd.from_pandas(df).repartition(4), set_col="s", item_col="i",
        n_rows=len(df)).to_pandas().sort_values(["item_a", "item_b"])
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["item_a"], r["item_b"]) == ("x", "y")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard"] == 2.0 / 4.0

    got2 = cooccurrence_jaccard(
        rd.from_pandas(df).repartition(9), set_col="s", item_col="i") \
        .to_pandas().sort_values(["item_a", "item_b"])
    assert got2.reset_index(drop=True).equals(
        got.reset_index(drop=True))
