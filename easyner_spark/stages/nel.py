"""Stage 4 — entity linking (NEL): mentions → linked mentions.

Reference analog: scripts/nel.py:28-59 — exact-surface lookup into a
3-column (entity, id, name) TSV dict; unseen surfaces are minted a
sequential ``easyner:{n}`` id which is added back to the lookup so
later occurrences reuse it, and the new rows are exported
(missing_entities.tsv, nel.py:78-79).

The reference's mint order depends on file iteration order — unusable
under parallelism. Deterministic re-spec (SURVEY.md §2.3 J1): misses
are ranked by first-occurrence key ``(surface)`` lexicographically and
numbered densely; ids differ from the reference's but are stable
across runs/parallelism, and downstream contracts (frequency RANKINGS,
triple P/R on names) are unaffected.

Plan shape: broadcast hash LEFT join against the dimension (dimension
≪ facts at any scale); the mint path is one tiny distinct + window
over ONLY the miss surfaces (bounded by vocabulary size, not corpus
size), then broadcast back — no large shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def link_entities(
    mentions: DataFrame,
    lookup: DataFrame,
    mint_prefix: str = "easyner:",
) -> tuple[DataFrame, DataFrame]:
    """Returns (linked, new_entities).

    ``lookup`` is (entity, id, name) — exact-surface key (the reference
    matches raw surface case-sensitively, nel.py:38).
    ``linked`` = mentions + (ent_id, ent_name).
    ``new_entities`` = the minted dimension rows (entity, id, name) to
    be merged back into the lookup (U1 — idempotent dimension upsert).
    """
    lk = lookup.select(
        F.col("entity"), F.col("id").alias("ent_id"), F.col("name").alias("ent_name")
    ).dropDuplicates(["entity"])

    joined = mentions.join(
        F.broadcast(lk), mentions["surface"] == lk["entity"], "left"
    ).drop("entity")

    # misses from the pre-distinct surface set (partial-agg shuffles only
    # |vocab| rows) anti-joined against the dimension — cheaper than
    # re-deriving the full fact join a second time
    misses = (
        mentions.select("surface")
        .distinct()
        .join(F.broadcast(lk.select(F.col("entity").alias("surface"))), "surface", "left_anti")
        .withColumn(
            "mint_id",
            F.concat(
                F.lit(mint_prefix),
                F.row_number().over(Window.orderBy("surface")).cast("string"),
            ),
        )
    )
    new_entities = misses.select(
        F.col("surface").alias("entity"),
        F.col("mint_id").alias("id"),
        F.col("surface").alias("name"),
    )

    linked = (
        joined.join(F.broadcast(misses), "surface", "left")
        .withColumn("ent_id", F.coalesce("ent_id", "mint_id"))
        .withColumn("ent_name", F.coalesce("ent_name", "surface"))
        .drop("mint_id")
    )
    return linked, new_entities
