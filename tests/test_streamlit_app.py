"""Drive the Streamlit branch of serving/app.py with a faithful API
double.

The image has no streamlit package, so the reference's primary UI
surface (src/app.py:1-346) is exercised against a test double that
implements exactly the st.* API the app uses (cache_resource, sidebar
selectbox, session_state, chat flow, columns/buttons, placeholder
streaming, expander). This verifies OUR branch logic — streaming
accumulation, message-state handling, sources rendering, suggested
queries, and feedback wiring — end to end.
"""

import contextlib
import json
import sys
import types

import pytest

from a_nice_rag_tpu.config import InfoSource
from a_nice_rag_tpu.index import build_index
from a_nice_rag_tpu.rag import FakeLLMClient, RAGSystem
from a_nice_rag_tpu.retrieval.embed import PrecomputedEmbedder
from a_nice_rag_tpu.retrieval.rerank import IdentityReranker
from a_nice_rag_tpu.testing import synth_corpus


class _SessionState:
    def __init__(self):
        object.__setattr__(self, "_data", {})

    def __contains__(self, key):
        return key in self._data

    def __getattr__(self, key):
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self._data[key] = value


class _Column:
    def __init__(self, st):
        self._st = st

    def button(self, label):
        return label in self._st.clicked


class _Placeholder:
    def __init__(self, st):
        self._st = st
        self.renders = []

    def markdown(self, text):
        self.renders.append(text)
        self._st.log.append(("placeholder", text))


class FakeStreamlit(types.ModuleType):
    """Implements the st.* surface serving/app.run_streamlit touches."""

    def __init__(self, chat_input_value=None, clicked=()):
        super().__init__("streamlit")
        self.session_state = _SessionState()
        self.log = []
        self.placeholders = []
        self.chat_input_value = chat_input_value
        self.clicked = set(clicked)
        self.sidebar = self

    # -- layout / widgets ------------------------------------------------
    def cache_resource(self, fn):
        cache = {}

        def wrapper(*a):
            if "v" not in cache:
                cache["v"] = fn(*a)
            return cache["v"]

        return wrapper

    def title(self, text):
        self.log.append(("title", text))

    def markdown(self, text):
        self.log.append(("markdown", text))

    def selectbox(self, label, options):
        self.log.append(("selectbox", label, tuple(options)))
        return options[0]

    def columns(self, n):
        return [_Column(self) for _ in range(n)]

    def chat_input(self, placeholder):
        return self.chat_input_value

    def empty(self):
        p = _Placeholder(self)
        self.placeholders.append(p)
        return p

    @contextlib.contextmanager
    def chat_message(self, role):
        self.log.append(("chat_message", role))
        yield self

    @contextlib.contextmanager
    def expander(self, label):
        self.log.append(("expander", label))
        yield self


@pytest.fixture(scope="module")
def system():
    from a_nice_rag_tpu.serving.app import SUGGESTED_QUERIES

    c = synth_corpus(n_docs=150, dim=32, n_queries=4, seed=77)
    idx = build_index(
        ids=c.ids, sources=c.sources, contents=c.contents, urls=c.urls,
        embeddings=c.embeddings, token_lists=c.tokens,
    )
    table = {"What is the treatment?": c.query_embeddings["voyage-3-large"][0]}
    for i, s in enumerate(SUGGESTED_QUERIES):
        table[s] = c.query_embeddings["voyage-3-large"][
            (i + 1) % len(c.query_embeddings["voyage-3-large"])
        ]
    return RAGSystem(
        indexes={InfoSource.NICE: idx},
        embedder=PrecomputedEmbedder(table),
        reranker=IdentityReranker(),
        llm_clients={"openai": FakeLLMClient()},
    )


def _run_with(monkeypatch, tmp_path, system, **stub_kwargs):
    from a_nice_rag_tpu.serving.app import run_streamlit

    monkeypatch.chdir(tmp_path)
    st = FakeStreamlit(**stub_kwargs)
    monkeypatch.setitem(sys.modules, "streamlit", st)
    run_streamlit(system)
    return st


def test_streamlit_chat_flow(monkeypatch, tmp_path, system):
    st = _run_with(
        monkeypatch, tmp_path, system,
        chat_input_value="What is the treatment?",
    )
    # model selector offered the full option matrix
    assert any(e[0] == "selectbox" for e in st.log)
    # the user + assistant turns landed in session state
    msgs = st.session_state.messages
    assert [m["role"] for m in msgs] == ["user", "assistant"]
    assert msgs[1]["content"].startswith("[fake:")
    # the placeholder streamed progressively growing markdown
    renders = st.placeholders[0].renders
    assert len(renders) > 1 and renders[-1].startswith(renders[0])
    # sources expander rendered markdown links with urls
    assert ("expander", "Sources") in st.log
    assert any(
        e[0] == "markdown" and "](http" in e[1] and e[1].startswith("- [")
        for e in st.log
    )


def test_streamlit_suggested_query_and_feedback(monkeypatch, tmp_path, system):
    from a_nice_rag_tpu.serving.app import SUGGESTED_QUERIES

    st = _run_with(
        monkeypatch, tmp_path, system,
        chat_input_value=None,
        clicked={SUGGESTED_QUERIES[0], "👍"},
    )
    msgs = st.session_state.messages
    assert msgs[0]["content"] == SUGGESTED_QUERIES[0]
    # thumbs-up persisted to the feedback log (reference: app.py:36-58)
    data = json.loads((tmp_path / "feedback/query_feedback.json").read_text())
    assert data and data[-1]["rating"] == "up"
    assert data[-1]["query"] == SUGGESTED_QUERIES[0]


def test_streamlit_no_input_renders_shell(monkeypatch, tmp_path, system):
    st = _run_with(monkeypatch, tmp_path, system, chat_input_value=None)
    assert ("title", "Clinical guidelines assistant") in st.log
    assert "messages" in st.session_state
    assert st.session_state.messages == []
