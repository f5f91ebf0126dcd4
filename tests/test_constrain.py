"""Constrained-decoding automata (models/constrain.py): the byte-level
regex engine must agree with Python's ``re`` under full-match semantics,
the bounded-depth JSON DFA must accept exactly strict JSON (fuzzed via
json.dumps), and vocab lowering must walk multi-byte tokens correctly.

The reference repairs malformed structured output after the fact with an
LLM round-trip (reference ragas_modified/prompt.py FixOutputFormat);
these tables instead make invalid output unsamplable.
"""

import json
import random
import re

import numpy as np

from a_nice_rag_tpu.models.constrain import (
    choice_dfa,
    compile_constraint,
    json_dfa,
    literal_dfa,
    regex_dfa,
    unconstrained,
    vocab_table,
)

PATTERNS = [
    r"-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?",
    r"(abc|ab*d)+",
    r"[a-f0-9]{4,8}",
    r"yes|no|maybe",
    r'"([^"\\]|\\.)*"',
    r"\w+@\w+\.(com|org)",
    r"a{2,4}b?",
    r"[^x]*x",
    r"(?:ab|a)(?:c|bc)",
]


def test_regex_matches_re_fullmatch():
    rng = random.Random(0)
    alpha = 'ab01cdef9."\\@-+eE xyesnomaybe'
    for pat in PATTERNS:
        dfa = regex_dfa(pat)
        cre = re.compile("(?s)" + pat)
        for _ in range(2000):
            s = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 10))
            )
            assert dfa.matches(s.encode()) == (
                cre.fullmatch(s) is not None
            ), (pat, s)


def test_regex_trim_invariant():
    """Every live non-accepting state keeps at least one allowed byte
    (the decode program relies on this: no dead-end states)."""
    for pat in PATTERNS:
        dfa = regex_dfa(pat)
        has_out = (dfa.next >= 0).any(axis=1)
        assert np.all(has_out | dfa.accept)


def test_json_dfa_accepts_strict_json():
    jd = json_dfa(max_depth=6)
    good = [
        '{"a": [1, 2.5e-3, "x\\n", true, null]}',
        "[]",
        " 42 ",
        '"hi"',
        '{"k": {"n": {"d": [[1]]}}}',
        "-0.5",
        '[{"a":1},{"b":[false]}]',
        '{"u": "\\u00e9"}',
    ]
    bad = [
        "{a:1}",
        "[1,]",
        '{"a":}',
        "01",
        '"unterminated',
        '{"a" 1}',
        "tru",
        "[1 2]",
        "{,}",
        "+5",
        "--1",
        '{"a":1,}',
        "1.e3",
        '["\\q"]',
    ]
    for g in good:
        assert jd.matches(g.encode()), g
    for b in bad:
        assert not jd.matches(b.encode()), b
    assert jd.matches(("[" * 6 + "1" + "]" * 6).encode())
    assert not jd.matches(("[" * 7 + "1" + "]" * 7).encode())


def test_json_dfa_fuzz_against_json_dumps():
    jd = json_dfa(max_depth=6)
    for i in range(300):
        r = random.Random(i)

        def gen(d):
            c = r.randint(0, 5 if d < 3 else 3)
            if c == 0:
                return r.randint(-99, 99)
            if c == 1:
                return round(r.uniform(-5, 5), 3)
            if c == 2:
                return r.choice([True, False, None])
            if c == 3:
                return 'a"b\\c\n'[: r.randint(0, 5)]
            if c == 4:
                return [gen(d + 1) for _ in range(r.randint(0, 3))]
            return {f"k{j}": gen(d + 1) for j in range(r.randint(0, 3))}

        s = json.dumps(gen(0))
        assert jd.matches(s.encode()), s


def test_json_top_level_variants():
    jo = json_dfa(top_level="object")
    ja = json_dfa(top_level="array")
    assert jo.matches(b'{"a": 1}') and not jo.matches(b"[1]")
    assert not jo.matches(b"3")
    assert ja.matches(b"[1, 2]") and not ja.matches(b'{"a": 1}')


def test_choice_and_literal():
    c = choice_dfa(["alpha", "beta", "alp"])
    assert c.matches(b"alp") and c.matches(b"alpha")
    assert not c.matches(b"alph") and not c.matches(b"gamma")
    lit = literal_dfa("héllo")
    assert lit.matches("héllo".encode()) and not lit.matches(b"hell")


def test_vocab_table_byte_level():
    con = compile_constraint("json_object", vocab_size=512, eos_id=257)
    # Start state: only '{' and whitespace lead anywhere; EOS forbidden.
    assert con.table[0, ord("{")] >= 0
    assert con.table[0, ord("}")] == -1
    assert con.table[0, 257] == -1
    # Specials other than EOS are never allowed.
    assert (con.table[:, 256] == -1).all()
    assert (con.table[:, 258:] == -1).all()
    # Walk a complete object; the final state must allow EOS.
    s = 0
    for b in b'{"a": 1}':
        s = int(con.table[s, b])
        assert s >= 0
    assert int(con.table[s, 257]) == s


def test_vocab_table_multibyte_tokens():
    tb = {300: b'{"', 301: b'a":', 302: b"1}", 303: b"}"}
    vt = vocab_table(json_dfa(top_level="object"), 512, 257, tb)
    other = [i for i in range(512) if i not in tb and i != 257]
    assert (vt[:, other] == -1).all()
    s = int(vt[0, 300])
    s2 = int(vt[s, 301])
    s3 = int(vt[s2, 302])
    assert s >= 0 and s2 >= 0 and s3 >= 0
    assert int(vt[s3, 257]) == s3  # accepting after the closing '}'
    assert int(vt[0, 303]) == -1  # can't open with '}'


def test_unconstrained_identity():
    u = unconstrained(512)
    assert u.table.shape == (1, 512)
    assert (u.table == 0).all()  # everything allowed, always accepting


def test_compile_constraint_specs():
    assert compile_constraint(["a", "b"], 512, 257).table[0, ord("a")] >= 0
    r = compile_constraint(r"[0-9]+", 512, 257)
    assert r.table[0, ord("5")] >= 0 and r.table[0, ord("x")] == -1
    assert r.table[0, 257] == -1  # empty string not in [0-9]+


def test_schema_dfa_pydantic_roundtrip():
    """schema_dfa accepts exactly documents that validate against the
    pydantic model: every accepted fuzz sample validates; type/key
    violations are rejected at the automaton level."""
    from typing import List as TList, Optional as TOpt

    from pydantic import BaseModel

    from a_nice_rag_tpu.models.constrain import schema_dfa

    class Verdict(BaseModel):
        statement: str
        verdict: int

    class Out(BaseModel):
        statements: TList[Verdict]
        score: float
        ok: bool
        note: TOpt[str] = None

    dfa = schema_dfa(Out.model_json_schema())
    good = [
        '{"statements": [], "score": 1, "ok": true, "note": null}',
        '{"statements": [{"statement": "a", "verdict": 0}], '
        '"score": -2.5e3, "ok": false, "note": "x"}',
    ]
    bad = [
        '{"score": 1, "ok": true, "note": null}',  # missing key
        '{"statements": [], "score": "s", "ok": true, "note": null}',
        '{"statements": [{"statement": 1, "verdict": 0}], '
        '"score": 1, "ok": true, "note": null}',  # wrong inner type
        '{"statements": [], "score": 1, "ok": true, "note": null,}',
    ]
    for g in good:
        assert dfa.matches(g.encode()), g
        Out.model_validate_json(g)
    for b in bad:
        assert not dfa.matches(b.encode()), b


def test_schema_dfa_enum_literal_arrays():
    from a_nice_rag_tpu.models.constrain import schema_dfa

    schema = {
        "type": "object",
        "properties": {
            "label": {"enum": ["yes", "no", 3]},
            "tags": {"type": "array", "items": {"type": "string"},
                     "minItems": 1, "maxItems": 2},
        },
    }
    dfa = schema_dfa(schema)
    assert dfa.matches(b'{"label": "yes", "tags": ["a"]}')
    assert dfa.matches(b'{"label": 3, "tags": ["a", "b"]}')
    assert not dfa.matches(b'{"label": "maybe", "tags": ["a"]}')
    assert not dfa.matches(b'{"label": "yes", "tags": []}')
    assert not dfa.matches(b'{"label": "yes", "tags": ["a","b","c"]}')


def test_schema_dfa_compact_mode():
    from a_nice_rag_tpu.models.constrain import schema_dfa

    schema = {"type": "object",
              "properties": {"a": {"type": "integer"}}}
    loose = schema_dfa(schema)
    tight = schema_dfa(schema, compact=True)
    assert loose.matches(b'{ "a" : 1 }')
    assert tight.matches(b'{"a":1}')
    assert not tight.matches(b'{"a": 1}')  # whitespace banned
    assert tight.n_states < loose.n_states


def test_schema_dfa_default_caps_bound_strings_and_arrays():
    """default_max_string / default_max_items close free-form strings
    and unbounded arrays at the cap, so a weak model under guidance
    cannot spend its whole budget inside one field; declared bounds
    keep priority and capped outputs still validate."""
    import json

    from pydantic import BaseModel

    from a_nice_rag_tpu.models.constrain import schema_dfa

    class Out(BaseModel):
        statements: list[str]

    d = schema_dfa(Out.model_json_schema(), compact=True,
                   default_max_string=20, default_max_items=2)

    def walk(doc: str):
        s = 0
        for i, b in enumerate(doc.encode()):
            s = int(d.next[s, b])
            if s < 0:
                return None, i
        return s, None

    ok = json.dumps({"statements": ["short", "x" * 20]},
                    separators=(",", ":"))
    s, died = walk(ok)
    assert died is None and bool(d.accept[s])
    Out.model_validate_json(ok)

    too_long = json.dumps({"statements": ["y" * 21]},
                          separators=(",", ":"))
    _, died = walk(too_long)
    assert died is not None

    too_many = json.dumps({"statements": ["a", "b", "c"]},
                          separators=(",", ":"))
    _, died = walk(too_many)
    assert died is not None
