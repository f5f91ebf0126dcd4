"""LangGraph / langchain-core message converter.

Equivalent of ragas_modified/integrations/langgraph.py. Duck-typed on
the langchain-core message interface (``.type``, ``.content``, optional
``.tool_calls``) so the conversion works on real langchain messages when
that package is installed AND on any object exposing the same
attributes — no import required.
"""

from __future__ import annotations

import json
from typing import Any, List, Sequence

from a_nice_rag_tpu.evals.ragas.dataset import Message

_TYPE_MAP = {
    "human": "human",
    "ai": "ai",
    "system": "system",
    "tool": "tool",
}


def convert_to_ragas_messages(messages: Sequence[Any]) -> List[Message]:
    out: List[Message] = []
    for m in messages:
        mtype = getattr(m, "type", None) or type(m).__name__.lower().replace(
            "message", ""
        )
        role = _TYPE_MAP.get(mtype, mtype)
        for tc in getattr(m, "tool_calls", None) or []:
            name = tc.get("name") if isinstance(tc, dict) else getattr(tc, "name", "")
            args = tc.get("args") if isinstance(tc, dict) else getattr(tc, "args", {})
            out.append(
                Message(
                    role="tool_call",
                    content=json.dumps({"name": name, "args": args or {}}),
                )
            )
        content = getattr(m, "content", None)
        if content:
            if not isinstance(content, str):
                content = json.dumps(content)
            out.append(Message(role=role, content=content))
    return out
