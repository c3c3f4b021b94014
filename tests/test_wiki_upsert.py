"""metabot reconcile/upsert MERGE (operators/wiki_upsert.py) — each case
mirrors a branch of UploadItem.update_prop_claims / prohibit."""

import pandas as pd
import pytest

from sophox_spark.operators import wiki_upsert


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=list(wiki_upsert.CLAIM_COLS)),
        "item string, prop string, value string, rank string, quals string",
    )


@pytest.fixture()
def merged(spark):
    existing = _df(spark, [
        # identical set → unchanged
        ("Q1", "instance_of", "Q7", "normal", ""),
        # rank differs → replace (desired rank wins, UploadItem.py:148)
        ("Q1", "status", "approved", "normal", ""),
        # qualifiers differ → replace with the desired qualifier set
        # (UploadItem.py:149-170)
        ("Q1", "redirects_to", "Q9", "normal", "since=2019"),
        # value removed + value added under one prop
        ("Q2", "use_on", "node", "normal", ""),
        ("Q2", "use_on", "way", "normal", ""),
        # user-edited prop, differing → blocked
        ("Q3", "description", "user text", "normal", ""),
        # user-edited prop, identical → unchanged (prohibit is skipped
        # when the sets already match)
        ("Q3", "status", "de facto", "normal", ""),
        # desired says nothing about a no-del prop → kept
        ("Q4", "image", "File:a.jpg", "normal", ""),
        # desired says nothing about a normal prop → deleted
        ("Q4", "status", "draft", "normal", ""),
    ])
    desired = _df(spark, [
        ("Q1", "instance_of", "Q7", "normal", ""),
        ("Q1", "status", "approved", "preferred", ""),
        ("Q1", "redirects_to", "Q9", "normal", "since=2024;by=bot"),
        ("Q2", "use_on", "way", "normal", ""),
        ("Q2", "use_on", "area", "normal", ""),
        ("Q3", "description", "wiki text", "normal", ""),
        ("Q3", "status", "de facto", "normal", ""),
        # brand-new item, and its prop IS in the contribs cache — must
        # still apply (is_new never blocks, UploadItem.py:70-71)
        ("Q5", "description", "new item", "normal", ""),
    ])
    contribs = spark.createDataFrame(
        pd.DataFrame(
            [("Q3", "description"), ("Q3", "status"), ("Q5", "description")],
            columns=["item", "prop"],
        )
    )
    out = wiki_upsert.reconcile_claims(existing, desired, contribs)
    return existing, desired, contribs, out


def test_decisions_and_final_state(spark, merged):
    existing, desired, contribs, out = merged
    rows = out.collect()
    state = {(r.item, r.prop, r.value): (r.rank, r.quals, r.decision) for r in rows}

    assert state[("Q1", "instance_of", "Q7")][2] == "unchanged"
    # rank updated to desired
    assert state[("Q1", "status", "approved")] == ("preferred", "", "replace")
    # qualifier set replaced wholesale
    assert state[("Q1", "redirects_to", "Q9")] == (
        "normal", "since=2024;by=bot", "replace")
    # value-level add/remove under one prop
    q2 = {r.value for r in rows if r.item == "Q2"}
    assert q2 == {"way", "area"}
    # user-edited, differing → existing text survives
    assert state[("Q3", "description", "user text")][2] == "blocked"
    assert ("Q3", "description", "wiki text") not in state
    # user-edited but identical → unchanged, not blocked
    assert state[("Q3", "status", "de facto")][2] == "unchanged"
    # never-delete prop survives an empty desired set
    assert state[("Q4", "image", "File:a.jpg")][2] == "kept_no_del"
    # ordinary prop with no desired claims is deleted
    assert not [r for r in rows if r.item == "Q4" and r.prop == "status"]
    # new item: contribs cache cannot block creation
    assert state[("Q5", "description", "new item")][2] == "replace"


def test_idempotent_replay(spark, merged):
    """Re-running the merge with its own output as existing is a no-op:
    every pair decides 'unchanged' and the state is identical."""
    existing, desired, contribs, out = merged
    final = out.drop("decision")
    again = wiki_upsert.reconcile_claims(final, desired, contribs)
    # Q4/status was deleted in round 1 and desired still doesn't want
    # it; Q3/description stays blocked-shaped (existing==blocked text,
    # desired differs) — so decisions are unchanged|blocked, state equal
    assert set(again.select("decision").distinct().toPandas()["decision"]) <= {
        "unchanged", "blocked", "kept_no_del"
    }
    a = {tuple(r) for r in final.collect()}
    b = {tuple(r) for r in again.drop("decision").collect()}
    assert a == b


def test_overwrite_whitelist_unblocks(spark, merged):
    existing, desired, contribs, _ = merged
    out = wiki_upsert.reconcile_claims(
        existing, desired, contribs, overwrite_props=("description",)
    )
    state = {(r.item, r.prop, r.value): r.decision for r in out.collect()}
    assert state[("Q3", "description", "wiki text")] == "replace"
    assert ("Q3", "description", "user text") not in state


def test_summary_counters(spark, merged):
    *_, out = merged
    summary = {
        r.decision: (r.n_claims, r.n_pairs)
        for r in wiki_upsert.reconcile_summary(out).collect()
    }
    assert summary["blocked"] == (1, 1)
    assert summary["kept_no_del"] == (1, 1)
    # Q1 status + Q1 redirects_to + Q2 use_on + Q5 description
    assert summary["replace"][1] == 4
