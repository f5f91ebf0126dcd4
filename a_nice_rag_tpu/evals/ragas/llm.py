"""Judge LLM wrappers.

Protocol + adapters covering the reference's LLM wrapper layer
(ragas_modified/llms/base.py): retrying generation, truncation
detection (LLMDidNotFinish), an OpenAI-compatible REST judge, and a
deterministic fake for hermetic tests.
"""

from __future__ import annotations

import asyncio
import json
import os
import re
import urllib.request
from typing import Callable, List, Optional


class LLMDidNotFinishException(Exception):
    """The judge stopped for a non-'stop' reason (truncation etc.)."""


class BaseJudgeLLM:
    async def agenerate(
        self, prompt: str, n: int = 1, temperature: float = 1e-8
    ) -> List[str]:
        raise NotImplementedError

    def generate(self, prompt: str, n: int = 1, temperature: float = 1e-8):
        # asyncio.run, not get_event_loop(): the latter can return a
        # closed loop left behind by an earlier asyncio.run in the same
        # process and fail with "Event loop is closed".
        return asyncio.run(self.agenerate(prompt, n, temperature))


class OpenAICompatJudgeLLM(BaseJudgeLLM):
    """Non-streaming chat-completions judge (default judge model mirrors
    the reference's llm_factory default)."""

    def __init__(
        self,
        model: str = "gpt-4o-mini",
        api_key: Optional[str] = None,
        base_url: str = "https://api.openai.com/v1/",
        timeout: float = 180.0,
        cost_tracker=None,
    ):
        self.model = model
        self.api_key = api_key or os.getenv("OPENAI_API_KEY")
        if not self.api_key:
            raise ValueError("OPENAI_API_KEY not set")
        self.base_url = base_url.rstrip("/") + "/"
        self.timeout = timeout
        self.cost_tracker = cost_tracker

    def _call(self, prompt: str, n: int, temperature: float) -> List[str]:
        payload = {
            "model": self.model,
            "messages": [{"role": "user", "content": prompt}],
            "n": n,
            "temperature": temperature,
        }
        req = urllib.request.Request(
            self.base_url + "chat/completions",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            out = json.loads(resp.read().decode("utf-8"))
        if self.cost_tracker is not None:
            from a_nice_rag_tpu.evals.ragas.cost import parse_openai_usage

            self.cost_tracker.record(parse_openai_usage(out))
        texts = []
        for choice in out.get("choices", []):
            if choice.get("finish_reason") not in (None, "stop"):
                raise LLMDidNotFinishException(
                    f"finish_reason={choice.get('finish_reason')}"
                )
            texts.append(choice["message"]["content"])
        return texts

    async def agenerate(self, prompt, n=1, temperature=1e-8):
        return await asyncio.to_thread(self._call, prompt, n, temperature)


class FakeJudgeLLM(BaseJudgeLLM):
    """Scripted judge for tests: responder(prompt) -> str or list[str]."""

    def __init__(self, responder: Optional[Callable[[str], object]] = None):
        self.responder = responder
        self.prompts: List[str] = []

    async def agenerate(self, prompt, n=1, temperature=1e-8):
        self.prompts.append(prompt)
        if self.responder is None:
            return ["{}"] * n
        out = self.responder(prompt)
        if isinstance(out, list):
            return (out * n)[:n]
        return [out] * n


_IMAGE_MD = re.compile(r"!\[[^\]]*\]\((https?://[^\s)]+|data:image/[^\s)]+)\)")


def prompt_to_content_parts(prompt: str) -> List[dict]:
    """Split a prompt with markdown image refs into OpenAI content parts.

    ``![...](url-or-data-uri)`` becomes an image_url part in place; the
    surrounding text stays ordered around it. A prompt with no images
    yields a single text part.
    """
    parts: List[dict] = []
    pos = 0
    for m in _IMAGE_MD.finditer(prompt):
        text = prompt[pos:m.start()]
        if text.strip():
            parts.append({"type": "text", "text": text})
        parts.append(
            {"type": "image_url", "image_url": {"url": m.group(1)}}
        )
        pos = m.end()
    tail = prompt[pos:]
    if tail.strip() or not parts:
        parts.append({"type": "text", "text": tail})
    return parts


class MultimodalJudgeLLM(OpenAICompatJudgeLLM):
    """Vision-capable chat-completions judge.

    The multimodal metrics (metrics/multimodal.py) render image contexts
    as markdown image references; a text-only judge sees the URLs, this
    client instead ships them as proper image_url content parts so the
    model actually looks at the pixels. Text-only prompts degrade to a
    single text part (safe as the default judge for mixed suites).
    """

    def _call(self, prompt: str, n: int, temperature: float) -> List[str]:
        parts = prompt_to_content_parts(prompt)
        if len(parts) == 1 and parts[0]["type"] == "text":
            return super()._call(prompt, n, temperature)
        payload = {
            "model": self.model,
            "messages": [{"role": "user", "content": parts}],
            "n": n,
            "temperature": temperature,
        }
        req = urllib.request.Request(
            self.base_url + "chat/completions",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            out = json.loads(resp.read().decode("utf-8"))
        if self.cost_tracker is not None:
            from a_nice_rag_tpu.evals.ragas.cost import parse_openai_usage

            self.cost_tracker.record(parse_openai_usage(out))
        texts = []
        for choice in out.get("choices", []):
            if choice.get("finish_reason") not in (None, "stop"):
                raise LLMDidNotFinishException(
                    f"finish_reason={choice.get('finish_reason')}"
                )
            texts.append(choice["message"]["content"])
        return texts
