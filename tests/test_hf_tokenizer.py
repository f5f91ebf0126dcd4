"""HF tokenizer.json byte maps (models/hf_tokenizer.py) and guided
decoding lowered onto a MULTI-BYTE vocabulary: the constraint table is
built by walking each token's byte string, so a model whose tokens are
BPE pieces (not raw bytes) still can only emit grammar-valid byte
sequences.
"""

import json

import pytest

from a_nice_rag_tpu.models.constrain import (
    Constraint,
    compile_constraint,
    json_dfa,
)
from a_nice_rag_tpu.models.hf_tokenizer import (
    bytes_to_unicode,
    hf_token_bytes,
    load_token_bytes,
)

B2U = bytes_to_unicode()


def _tok_str(data: bytes) -> str:
    return "".join(B2U[b] for b in data)


def _fixture(vocab_bytes, specials=()):
    """Minimal ByteLevel-BPE tokenizer.json."""
    vocab = {_tok_str(b): i for i, b in vocab_bytes.items()}
    for tid, name in specials:
        vocab[name] = tid
    return {
        "pre_tokenizer": {"type": "ByteLevel"},
        "decoder": {"type": "ByteLevel"},
        "added_tokens": [
            {"id": tid, "content": name} for tid, name in specials
        ],
        "model": {"type": "BPE", "vocab": vocab},
    }


VOCAB = {
    10: b'{"',
    11: b'a"',
    12: b": ",
    13: b"1",
    14: b"23",
    15: b"}",
    16: b'"yes"',
    17: b" ",
    18: b"\xc3\xa9",  # multi-byte UTF-8 ('e' acute) as one token
    19: b'":',
}


def test_byte_map_roundtrip():
    tok = _fixture(VOCAB, specials=[(500, "<|im_end|>")])
    tb, specials = hf_token_bytes(tok)
    assert tb == VOCAB
    assert 500 in specials and 500 not in tb


def test_non_byte_level_rejected():
    tok = {"pre_tokenizer": {"type": "Metaspace"},
           "decoder": {"type": "Metaspace"},
           "model": {"type": "BPE", "vocab": {}}}
    with pytest.raises(NotImplementedError):
        hf_token_bytes(tok)


def test_load_from_dir(tmp_path):
    tok = _fixture(VOCAB)
    (tmp_path / "tokenizer.json").write_text(json.dumps(tok))
    tb, _ = load_token_bytes(str(tmp_path))
    assert tb[10] == b'{"'


def test_multibyte_guided_generation():
    """End to end: a model over a BPE-piece vocabulary, JSON-object
    constrained — the concatenated BYTES of the emitted token ids are
    always a live prefix of strict JSON, and parse on natural stop."""
    from a_nice_rag_tpu.models.decoder import (
        init_decoder,
        small_lm_config,
    )
    from a_nice_rag_tpu.serving.genserver import GenerationServer

    eos = 257
    dfa = json_dfa(top_level="object")
    model, params = init_decoder(small_lm_config())
    con = compile_constraint(dfa, model.cfg.vocab_size, eos,
                             token_bytes=VOCAB, name="json_object")
    assert isinstance(con, Constraint)
    srv = GenerationServer(model, params, slots=2, max_len=96, chunk=4,
                           eos_id=eos, constraints={"json_object": con})
    try:
        for i in range(3):
            out = srv.complete([100 + i, 101], 16,
                               constraint="json_object",
                               temperature=1.0)
            data = b"".join(VOCAB[t] for t in out["tokens"])
            s = 0
            for b in data:
                s = int(dfa.next[s, b])
                assert s >= 0, (out["tokens"], data)
            if out["finish_reason"] == "stop":
                json.loads(data.decode())
    finally:
        srv.stop()
