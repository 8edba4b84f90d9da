"""Sequence packing for LLM-pretraining batch prep (SURVEY.md §7
extension): assign documents to fixed token-budget training sequences.

The pretraining dataloader concatenates documents into a token stream
and cuts it every ``budget`` tokens; which documents land in which
sequence must be a pure function of the data (not of partitioning or
seed), or a re-run shuffles the curriculum. The packing here is the
deterministic corpus-side version of that contract:

- each document hashes to a **shard** (md5-bucket of its id — same
  partitioning-independent idiom as operators/sampling.py);
- within a shard, documents stream in md5-hash order (id tie-break);
- the shard's running token total assigns each document to the sequence
  containing its first token: ``seq_no = floor(cum_before / budget)``.

Scale shape: one shuffle on the shard key, then a per-shard window
cumsum. Packing is sequential *by definition* (a running total over a
stream), so the unit of sequence work is the shard: pick ``n_shards``
so one shard's slice (corpus/n_shards) is task-sized — at 100 TB that
means tens of thousands of shards, each an independent stream, which is
exactly how production packers shard (one stream per input file). The
window itself is a sort + linear pass; no state beyond the running sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



def pack_sequences(df: DataFrame, id_col: str, n_tokens: Column | str, *,
                   budget: int = 256, n_shards: int = 8,
                   salt: str = "") -> DataFrame:
    """Assign every row to a ``(shard, seq_no)`` training sequence.

    Returns ``(id_col, n_tokens, shard, seq_no, offset)`` where
    ``offset`` is the document's first-token position within its
    shard's concatenated stream. All arithmetic is integer, the order
    key is the md5 hex string — bit-identical on any engine.
    """
    nt = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    idc = F.col(id_col)
    # ONE md5 per row: the shard is derived from the same hex string
    # that orders the shard stream (value-identical to
    # sampling.hash_bucket — same md5, same first-8-hex modulus), so
    # the shard/order pairing cannot drift apart
    base = (df.select(
        idc,
        nt.cast("long").alias("n_tokens"),
        F.md5(F.concat(idc.cast("string"), F.lit(salt))).alias("_h"))
        .withColumn("shard",
                    (F.conv(F.substring("_h", 1, 8), 16, 10).cast("long")
                     % n_shards).cast("int")))
    w = (Window.partitionBy("shard").orderBy("_h", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (base
            .withColumn("_cum", F.sum("n_tokens").over(w))
            .select(id_col, "n_tokens", "shard",
                    # integer div, not float /: exact past 2^53 tokens/shard
                    F.expr(f"(_cum - n_tokens) div {int(budget)}").alias("seq_no"),
                    (F.col("_cum") - F.col("n_tokens")).alias("offset")))


def packing_report(packed: DataFrame, *, budget: int = 256) -> DataFrame:
    """Per-sequence fill report: docs packed, tokens packed, and the
    integer fill ratio ``fill_e6 = tokens*1e6 div budget`` (can exceed
    1e6 — the doc straddling the cut carries its tail into the next
    sequence, matching concatenate-then-cut semantics)."""
    return (packed.groupBy("shard", "seq_no")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"))
            .select("shard", "seq_no", "n_docs", "n_tokens",
                    F.expr(f"n_tokens * 1000000L div {budget}").alias("fill_e6"))
            .orderBy("shard", "seq_no"))
