"""Deterministic synthetic transcripts / queries fixtures.

The engine's primary input is an Iceberg/parquet table of multi-turn
conversation transcripts with columns
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. The driver testdata has no text payload of that shape, so
tests and benchmarks synthesize it here — seeded, reproducible at any scale,
and generated *distributed* (per-conversation RNG keyed on the conversation
index, so output is identical regardless of partitioning or cluster size).

Text is bag-of-words over a closed ~5k-term vocabulary with Zipf-like term
frequencies, so posting-list lengths are realistically skewed (the reference
documents this skew in splade/utils/index_figure.py:21-29); a few head terms
appear in most documents to exercise skew splitting. Includes empty-text
turns and tab/newline-bearing text to exercise cleaning (reference strips
newlines at scan: splade/datasets/datasets.py:83-84).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
VOCAB_SIZE = 5000
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "search", "browser"]
BASE_EPOCH = 1_700_000_000  # fixed base (2023-11-14T22:13:20Z)

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def vocab() -> list[str]:
    """Closed deterministic vocabulary: term0000..term4999 plus head aliases.

    Zipf sampling over the *index* makes low indices head terms.
    """
    return [f"term{i:04d}" for i in range(VOCAB_SIZE)]


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


_VOCAB = np.array(vocab())
_PROBS = _zipf_probs(VOCAB_SIZE)


def _gen_conversation(i: int) -> list[tuple[str, int, str, str, str | None, int]]:
    """Generate one conversation's turns; pure function of the index."""
    rng = np.random.default_rng(SEED * 1_000_003 + i)
    conv_id = f"conv-{i:08d}"
    n_turns = int(rng.integers(1, 41))
    rows = []
    for t in range(n_turns):
        role = ROLES[int(rng.integers(0, 4))] if t else "user"
        tool = TOOLS[int(rng.integers(0, 3))] if role == "tool" else None
        r = rng.random()
        if r < 0.03:
            text = ""  # empty-text turn
        else:
            n_words = int(rng.integers(3, 60))
            words = _VOCAB[rng.choice(VOCAB_SIZE, size=n_words, p=_PROBS)]
            text = " ".join(words.tolist())
            if r < 0.08:  # tab/newline-bearing text
                text = text.replace(" ", "\t", 1).replace(" ", "\n", 1)
        ts = BASE_EPOCH + i * 3600 + t * 60
        rows.append((conv_id, t, role, text, tool, ts))
    return rows


def transcripts(spark: SparkSession, n_conversations: int, partitions: int = 0) -> DataFrame:
    """Distributed deterministic transcripts table of n_conversations convs."""
    partitions = partitions or max(4, n_conversations // 2000)
    base = spark.range(0, n_conversations, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for i in pdf["id"].tolist():
                out.extend(_gen_conversation(int(i)))
            df = pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )
            df["ts"] = pd.to_datetime(df["ts"], unit="s")
            yield df

    return base.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)


def queries(n_queries: int = 25) -> pd.DataFrame:
    """The fixture query set (reference analogue: dev_queries raw.tsv).

    Includes the edge cases from FIXTURES.md: an all-head-terms query, an
    out-of-vocabulary term (empty posting list — reference fills missing
    terms with empty arrays, splade/tasks/transformer_evaluator.py:124-128),
    a duplicate-term query, and an empty-after-tokenization query.
    """
    rng = np.random.default_rng(SEED + 7)
    rows = []
    mid = np.arange(50, 1500)  # mid-frequency band
    for q in range(n_queries - 4):
        n_terms = int(rng.integers(2, 9))
        terms = _VOCAB[rng.choice(mid, size=n_terms, replace=False)]
        rows.append((f"q{q:04d}", " ".join(terms.tolist())))
    n = n_queries - 4
    rows.append((f"q{n:04d}", " ".join(_VOCAB[:4].tolist())))  # head terms only
    rows.append((f"q{n + 1:04d}", "zzzunknownterm " + _VOCAB[200]))  # OOV term
    rows.append((f"q{n + 2:04d}", f"{_VOCAB[300]} {_VOCAB[300]} {_VOCAB[301]}"))  # dup
    rows.append((f"q{n + 3:04d}", "!!! ???"))  # empty after tokenization
    return pd.DataFrame(rows, columns=["query_id", "text"])


def queries_df(spark: SparkSession, n_queries: int = 25) -> DataFrame:
    return spark.createDataFrame(queries(n_queries))
