"""Vote statements + statement-level upsert (the vote-server analog).

The reference's vote-server writes per-feature ``osmm:task`` triples
(/root/reference/vote-server/server.js:154-175), and the ingestion
upsert deliberately PRESERVES them: its DELETE clause excludes the
``osmm:task`` predicate, so re-importing an element never wipes its
votes (/root/reference/osm2rdf/RdfUpdateHandler.py:42-57, filter at
:52). Statement-table analog:

    statements(subject string, ord long, stmt string)  — osm2ttl rows
    votes: subject + 'osmm:task …' statements, ord in the vote lane

``merge_statements`` replaces every statement of a re-imported subject
EXCEPT preserved-predicate rows, then appends the new batch — the exact
DELETE/INSERT shape, as anti-join + union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import ttl

VOTE_ORD = 5_000_000  # after metadata lane in the statement ordering


def vote_statements(votes_df: DataFrame) -> DataFrame:
    """(subject_type n/w/r, subject_id, user, direction) → statement rows
    ``subject, ord, stmt`` with stmt = 'osmm:task "<user>:<direction>"'."""
    prefix = F.create_map(
        F.lit("n"), F.lit("osmnode:"), F.lit("w"), F.lit("osmway:"),
        F.lit("r"), F.lit("osmrel:"),
    )
    subject = F.concat(prefix[F.col("subject_type")], F.col("subject_id"))
    payload = F.concat(F.col("user"), F.lit(":"), F.col("direction"))

    @F.pandas_udf("string")
    def task_stmt(vals):
        return ttl.str_statements("osmm:task", vals)

    return votes_df.select(
        subject.alias("subject"),
        F.lit(VOTE_ORD).alias("ord").cast("long"),
        task_stmt(payload).alias("stmt"),
    )


def merge_statements(
    base_df: DataFrame,
    batch_df: DataFrame,
    preserve_predicates: tuple[str, ...] = ("osmm:task",),
) -> DataFrame:
    """Statement-level MERGE: for every subject present in ``batch_df``,
    drop its old statements EXCEPT those whose predicate is preserved,
    then append the batch. Idempotent (re-applying the same batch yields
    the same table)."""
    subjects = batch_df.select("subject").distinct()
    preserved_cond = None
    for p in preserve_predicates:
        c = F.col("stmt").startswith(p + " ")
        preserved_cond = c if preserved_cond is None else (preserved_cond | c)
    untouched = base_df.join(subjects, "subject", "left_anti")
    kept_votes = base_df.join(subjects, "subject", "left_semi").filter(preserved_cond)
    # a batch may itself carry preserved-predicate rows (e.g. a replayed
    # vote batch): drop base rows identical to a batch row so re-applying
    # a batch that contains osmm:task rows stays idempotent
    kept_votes = kept_votes.join(
        batch_df, on=list(base_df.columns), how="left_anti"
    )
    return untouched.unionByName(kept_votes).unionByName(batch_df)
