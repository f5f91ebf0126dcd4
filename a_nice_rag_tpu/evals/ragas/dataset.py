"""Evaluation dataset schema and result container.

Pydantic sample/dataset/result types with the reference's column
vocabulary (ragas_modified/dataset_schema.py: user_input,
retrieved_contexts, response, reference, ...), pandas import/export, and
an EvaluationResult with per-metric score lists, traces, and cost.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
from pydantic import BaseModel


class SingleTurnSample(BaseModel):
    user_input: Optional[str] = None
    retrieved_contexts: Optional[List[str]] = None
    reference_contexts: Optional[List[str]] = None
    response: Optional[str] = None
    multi_responses: Optional[List[str]] = None
    reference: Optional[str] = None
    rubrics: Optional[Dict[str, str]] = None

    def get_features(self) -> List[str]:
        return [k for k, v in self.model_dump().items() if v is not None]


class Message(BaseModel):
    role: str
    content: str


class MultiTurnSample(BaseModel):
    user_input: List[Message]
    reference: Optional[str] = None
    reference_tool_calls: Optional[List[Dict[str, Any]]] = None
    rubrics: Optional[Dict[str, str]] = None

    def pretty_repr(self) -> str:
        return "\n".join(f"{m.role}: {m.content}" for m in self.user_input)


Sample = Union[SingleTurnSample, MultiTurnSample]


class EvaluationDataset:
    def __init__(self, samples: Sequence[Sample]):
        if not samples:
            raise ValueError("EvaluationDataset requires at least one sample")
        kinds = {type(s) for s in samples}
        if len(kinds) > 1:
            raise ValueError("All samples must be the same type")
        self.samples: List[Sample] = list(samples)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

    def is_multi_turn(self) -> bool:
        return isinstance(self.samples[0], MultiTurnSample)

    @classmethod
    def from_list(cls, rows: Sequence[Dict]) -> "EvaluationDataset":
        return cls([SingleTurnSample(**row) for row in rows])

    @classmethod
    def from_pandas(cls, df) -> "EvaluationDataset":
        return cls.from_list(df.to_dict("records"))

    def to_pandas(self):
        import pandas as pd

        return pd.DataFrame([s.model_dump() for s in self.samples])


class EvaluationResult:
    """Per-sample, per-metric scores with aggregate view."""

    def __init__(
        self,
        scores: List[Dict[str, float]],
        dataset: Optional[EvaluationDataset] = None,
        traces: Optional[List[Dict]] = None,
        cost: Optional[Dict] = None,
    ):
        self.scores = scores
        self.dataset = dataset
        self.traces = traces or []
        self.cost = cost
        self._scores_dict: Dict[str, List[float]] = {}
        for row in scores:
            for name, value in row.items():
                self._scores_dict.setdefault(name, []).append(value)

    def __getitem__(self, metric: str) -> List[float]:
        return self._scores_dict[metric]

    def aggregate(self) -> Dict[str, float]:
        return {
            name: float(np.nanmean(vals)) if len(vals) else float("nan")
            for name, vals in self._scores_dict.items()
        }

    def __repr__(self) -> str:
        agg = ", ".join(f"'{k}': {v:.4f}" for k, v in self.aggregate().items())
        return "{" + agg + "}"

    def to_pandas(self):
        import pandas as pd

        base = (
            self.dataset.to_pandas()
            if self.dataset is not None
            else pd.DataFrame()
        )
        for name, vals in self._scores_dict.items():
            base[name] = vals
        return base
