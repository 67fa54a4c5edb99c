"""Assemble stage: per-conversation profiles, including the per-turn
text-equality invariant under stable (conv_id, turn_idx) ordering
(BASELINE.json input_hint; SURVEY §2.9 O4)."""

import pandas as pd
import pytest
import ray.data as rd

from aml_entity_resolution_assignment_ray.functions.textnorm import normalize_text_series
from aml_entity_resolution_assignment_ray.stages.assemble import assemble_profiles


@pytest.fixture(scope="module")
def profiles_df(ray_session, small_corpus):
    ds = rd.from_arrow(small_corpus["transcripts"]).repartition(7)
    return assemble_profiles(ds).to_pandas()


def test_one_row_per_conversation(profiles_df, small_corpus):
    truth = small_corpus["truth"].to_pandas()
    assert len(profiles_df) == len(truth)
    assert set(profiles_df["conv_id"]) == set(truth["conv_id"])


def test_per_turn_text_equality_invariant(profiles_df, small_corpus):
    """text_concat must equal the normalized turn texts joined in
    turn_idx order — for EVERY conversation."""
    turns = small_corpus["transcripts"].to_pandas()
    turns["norm_text"] = normalize_text_series(turns["text"])
    expected = (
        turns.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["norm_text"]
        .agg("\n".join)
    )
    got = profiles_df.set_index("conv_id")["text_concat"]
    pd.testing.assert_series_equal(
        got.sort_index(), expected.sort_index(), check_names=False
    )


def test_fields_extracted_from_known_records(profiles_df, small_corpus):
    """Extraction must recover the generator's raw field values."""
    recs = {r["conv_id"]: r for r in small_corpus["records"]}
    prof = profiles_df.set_index("conv_id")
    checked = 0
    for conv_id, rec in recs.items():
        row = prof.loc[conv_id]
        for field in ["first_name", "last_name", "dob", "email",
                      "phone_number", "national_id", "address", "city", "country"]:
            expect = rec[field]
            got = row[field]
            if expect is None:
                assert got is None or (isinstance(got, float) and pd.isna(got)), (
                    conv_id, field, got)
            else:
                assert got == expect, (conv_id, field, got, expect)
        checked += 1
    assert checked == len(recs)


def test_n_turns_positive(profiles_df):
    assert (profiles_df["n_turns"] >= 4).all()
