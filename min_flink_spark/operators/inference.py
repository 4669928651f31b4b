"""Model-inference plumbing — scoring a corpus with a learned model.

A modern curation pipeline ends in model scoring (quality classifiers,
reward models, embedding encoders). The SPARK-SIDE contract is the same
regardless of the model runtime, and this module owns it:

- ``mapInPandas`` in ITERATOR form: the scorer factory runs ONCE per
  task (model load/ONNX session/tokenizer init amortize over every
  Arrow batch the task processes), then scores vectorized batches —
  never a per-row UDF;
- Arrow batch size controls peak memory
  (``spark.sql.execution.arrow.maxRecordsPerBatch``) independent of
  partition size;
- the scorer is a plain callable ``pandas.DataFrame -> pandas.Series``
  so torch/onnxruntime/sentence-transformers drop in without touching
  the plan.

This container ships no ML runtime (installs disallowed), so the
bundled ``fake_quality_scorer`` is a DETERMINISTIC stand-in (md5-hash
score in [0,1) — engine-reproducible, which is what lets the gate
hash-check the PLUMBING end-to-end). Swap the factory for a real model
loader in production; everything else is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def score_with_model(
    df: DataFrame,
    scorer_factory: Callable[[], Callable[[pd.DataFrame], pd.Series]],
    out_col: str = "model_score",
) -> DataFrame:
    """Append a model score column, loading the model once per task.

    ``scorer_factory`` runs inside the executor (keep it picklable and
    self-contained: import the runtime and load weights from a
    task-readable path INSIDE the factory). The returned scorer maps a
    pandas batch of the input columns to a float Series of the same
    length."""
    if out_col in df.columns:
        raise ValueError(f"score_with_model: column '{out_col}' already exists")
    out_schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = scorer_factory()  # once per task: model load amortizes
        for pdf in batches:
            out = pdf.copy()
            # Positional assignment, NOT pd.Series(..., index=pdf.index):
            # a real scorer that filtered/reset its index would
            # label-align into silent NaNs instead of erroring.
            scores = np.asarray(scorer(pdf), dtype="float64")
            if len(scores) != len(pdf):
                raise ValueError(
                    f"score_with_model: scorer returned {len(scores)} "
                    f"scores for a batch of {len(pdf)} rows"
                )
            out[out_col] = scores
            yield out

    return df.mapInPandas(run, schema=out_schema)


def fake_quality_scorer(text_col: str = "text") -> Callable[[], Callable]:
    """Deterministic stand-in model: score = md5(text)[:8] / 2^32 ∈
    [0,1). Engine-reproducible (DuckDB twin:
    ``('0x' || substr(md5(text),1,8))::BIGINT / 4294967296.0``), so the
    full inference plumbing sits under the oracle gate."""

    def factory() -> Callable[[pd.DataFrame], pd.Series]:
        def score(pdf: pd.DataFrame) -> pd.Series:
            return pdf[text_col].map(
                lambda t: int(hashlib.md5((t or "").encode()).hexdigest()[:8], 16)
                / 4294967296.0
            )

        return score

    return factory
