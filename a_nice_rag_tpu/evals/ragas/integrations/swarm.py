"""OpenAI Swarm / chat-completions message-dict converter.

Equivalent of ragas_modified/integrations/swarm.py: turns a list of
OpenAI-style message dicts (role/content, optional tool_calls) into the
framework's Message schema. Tool calls become role="tool_call" messages
whose content is the JSON the agentic metrics
(metrics/agentic.ToolCallAccuracy) parse.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List

from a_nice_rag_tpu.evals.ragas.dataset import Message


def convert_to_ragas_messages(
    messages: List[Dict[str, Any]],
) -> List[Message]:
    out: List[Message] = []
    for m in messages:
        role = m.get("role", "user")
        for tc in m.get("tool_calls") or []:
            fn = tc.get("function", tc)
            args = fn.get("arguments", {})
            if isinstance(args, str):
                try:
                    args = json.loads(args)
                except ValueError:
                    args = {"raw": args}
            out.append(
                Message(
                    role="tool_call",
                    content=json.dumps(
                        {"name": fn.get("name", ""), "args": args}
                    ),
                )
            )
        content = m.get("content")
        if content:
            role_map = {"tool": "tool", "assistant": "ai", "user": "human"}
            out.append(
                Message(role=role_map.get(role, role), content=str(content))
            )
    return out
