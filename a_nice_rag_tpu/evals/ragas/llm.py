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
        return asyncio.get_event_loop().run_until_complete(
            self.agenerate(prompt, n, temperature)
        )


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
