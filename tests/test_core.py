"""Core type / model / tokenizer unit tests.

Ports the reference's inline unit tests (see SURVEY.md section 4):
- ScoredToken JSON roundtrip (reference: src/lib.rs:266-278)
- Viterbi encode best path + dropout + byte fallback
  (reference: src/model.rs:202-253)
- SpecialTokenSplitter table (reference: src/tokenizer.rs:437-487)
"""

import json
import pickle

import pytest

from tokengeex_tpu import (
    Model,
    NoPathError,
    ScoredToken,
    Tokenizer,
    make_vocab,
    new_default_vocab,
    split_special_tokens,
)
from tokengeex_tpu.core.processors import CrlfProcessor, UnicodeProcessor


def test_serialize_scored_token():
    tok = ScoredToken(b"hello", 0.5, False)
    obj = tok.to_json_obj()
    back = ScoredToken.from_json_obj(json.loads(json.dumps(obj)))
    assert back.value == tok.value
    assert back.score == tok.score
    assert obj == {"value": "hello", "score": 0.5}


def test_serialize_non_utf8_token():
    tok = ScoredToken(b"\xff\xfe", -1.5, True)
    obj = tok.to_json_obj()
    assert obj["encoded"] is True
    assert obj["keep"] is True
    back = ScoredToken.from_json_obj(obj)
    assert back.value == b"\xff\xfe"
    assert back.keep is True


def test_encode():
    # reference: src/model.rs:208-215
    vocab = make_vocab([(b"a", -3.0), (b"b", -3.0), (b"c", -3.0), (b"ab", -4.0)])
    model = Model(vocab)
    assert model.encode("abc") == [3, 2]


def test_encode_dropout():
    # reference: src/model.rs:217-240
    vocab = make_vocab(
        [
            (b"a", -3.0),
            (b"b", -3.0),
            (b"c", -3.0),
            (b"d", -3.0),
            (b"e", -3.0),
            (b"f", -3.0),
            (b"ab", -4.0),
            (b"abc", -5.0),
            (b"abcd", -6.0),
            (b"abcde", -7.0),
            (b"abcdef", -8.0),
        ]
    )
    model = Model(vocab)
    assert model.encode("abcdef", 1.0) == [0, 1, 2, 3, 4, 5]
    # dropout=0.5 smoke: must still be a valid segmentation
    ids = model.encode("abcdef", 0.5)
    assert model.decode(ids) == "abcdef"


def test_decode_encode_invariants():
    # reference: src/model.rs:242-252
    model = Model(new_default_vocab())
    text = "你好，我叫罗杰斯"
    ids = model.encode(text)
    assert len(ids) == len(text.encode("utf-8"))
    assert model.decode(ids) == text


def test_no_path():
    vocab = make_vocab([(b"a", -1.0)])
    model = Model(vocab)
    with pytest.raises(NoPathError):
        model.encode("ab")


def test_tie_break_prefers_longer_token():
    # Two exactly-equal-score paths into the same dp cell: the earlier
    # (longer-token) candidate must win (reference: src/model.rs:100-108,
    # strict > with ascending start-pos candidate order).
    vocab = make_vocab([(b"a", -2.0), (b"b", -2.0), (b"ab", -4.0)])
    model = Model(vocab)
    # "ab" via token 2 scores -4.0; via [a, b] also -4.0. Candidate for
    # dp[2] from pos=0 (len 2) arrives first => token 2 wins.
    assert model.encode("ab") == [2]


def test_special_tokens_splitter():
    # reference: src/tokenizer.rs:441-487
    cases = [
        (
            "<EOS>Hello<EOS>",
            [("<EOS>", True), ("Hello", False), ("<EOS>", True)],
            ["<EOS>", "random", "<EOS_2>"],
        ),
        (
            "randomstring",
            [("random", True), ("string", False)],
            ["<EOS>", "random", "<EOS_2>"],
        ),
        (
            "random<EOS_2>string",
            [("random", True), ("<EOS_2>", True), ("string", False)],
            ["<EOS>", "random", "<EOS_2>"],
        ),
        (
            "nospecialtokens",
            [("nospecialtokens", False)],
            ["<EOS>", "random", "<EOS_2>"],
        ),
        ("No special tokens", [("No special tokens", False)], []),
    ]
    for text, expected, specials in cases:
        assert list(split_special_tokens(text, specials)) == expected


def _make_tokenizer():
    vocab = new_default_vocab() + make_vocab(
        [(b"hello", -1.0), (b" world", -1.5), (b"hell", -3.0)]
    )
    model = Model(vocab)
    return Tokenizer(model, [CrlfProcessor(), UnicodeProcessor("nfc")],
                     ["<eos>", "<fim>"])


def test_tokenizer_special_ids_after_base():
    tok = _make_tokenizer()
    base = tok.base_vocab_size()
    assert base == 259
    assert tok.special_token_to_id("<eos>") == base
    assert tok.special_token_to_id("<fim>") == base + 1
    assert tok.vocab_size() == base + 2
    assert tok.special_vocab_size() == 2
    assert tok.is_special(base) and not tok.is_special(base - 1)
    assert tok.is_base(base - 1) and not tok.is_base(base)
    assert tok.id_to_special_token(base + 1) == "<fim>"
    assert tok.id_to_token(base) == b"<eos>"
    assert tok.token_to_id(b"<eos>") == base
    assert tok.token_to_id(b"hello") == 256


def test_tokenizer_encode_decode_roundtrip():
    tok = _make_tokenizer()
    text = "hello world<eos>hello"
    ids = tok.encode(text)
    base = tok.base_vocab_size()
    assert base in ids
    assert tok.decode(ids, include_special_tokens=True) == text
    assert tok.decode(ids, include_special_tokens=False) == "hello worldhello"
    # CRLF preprocessing
    ids2 = tok.encode("hello\r\n")
    assert tok.decode(ids2) == "hello\n"


def test_tokenizer_encode_ordinary():
    tok = _make_tokenizer()
    ids = tok.encode_ordinary("<eos>")
    # No special handling: "<eos>" segments into bytes.
    assert all(tok.is_base(i) for i in ids)


def test_tokenizer_json_roundtrip():
    tok = _make_tokenizer()
    s = tok.to_string()
    obj = json.loads(s)
    assert obj["version"] == "2.0"
    assert list(obj.keys()) == ["version", "special_tokens", "processors", "vocab"]
    assert obj["processors"] == [{"type": "crlf"}, {"type": "unicode", "form": "nfc"}]
    back = Tokenizer.from_str(s)
    assert back.vocab_size() == tok.vocab_size()
    assert back.special_tokens() == tok.special_tokens()
    assert [t.value for t in back.model.vocab] == [t.value for t in tok.model.vocab]
    assert [t.score for t in back.model.vocab] == [t.score for t in tok.model.vocab]
    assert back.encode("hello world") == tok.encode("hello world")


def test_tokenizer_version_check():
    import pytest

    from tokengeex_tpu import TokenGeeXError

    with pytest.raises(TokenGeeXError):
        Tokenizer.from_str('{"version": "1.0", "special_tokens": [], '
                           '"processors": [], "vocab": []}')


def test_tokenizer_save_load(tmp_path):
    tok = _make_tokenizer()
    path = str(tmp_path / "tok.json")
    tok.save(path)
    back = Tokenizer.from_file(path)
    assert back.encode("hello world<eos>") == tok.encode("hello world<eos>")


def test_tokenizer_pickle():
    tok = _make_tokenizer()
    back = pickle.loads(pickle.dumps(tok))
    assert back.encode("hello world<eos>") == tok.encode("hello world<eos>")


def test_common_prefix_search():
    tok = _make_tokenizer()
    matches = list(tok.common_prefix_search("hello world"))
    # increasing length order (reference: src/trie.rs:44-64)
    ids = [m[0] for m in matches]
    lens = [m[1] for m in matches]
    assert lens == sorted(lens)
    assert tok.model.vocab[ids[-1]].value == b"hello"
    assert b"hell" in [tok.model.vocab[i].value for i in ids]


def test_duplicate_token_last_id_wins():
    # HashMap::insert + Trie::push overwrite semantics
    # (reference: src/model.rs:20-23).
    vocab = make_vocab([(b"x", -1.0), (b"x", -2.0)])
    model = Model(vocab)
    assert model.token_to_id(b"x") == 1
    assert model.encode("x") == [1]


def test_load_reference_format_fixture():
    # A checkpoint in the exact shape serde_json::to_string_pretty
    # produces (reference: src/tokenizer.rs:349-366, src/lib.rs:109-134),
    # including a base64 "encoded" token and sparse keep flags.
    import base64 as _b64
    import json as _json

    obj = {
        "version": "2.0",
        "special_tokens": ["<|eos|>"],
        "processors": [{"type": "crlf"}, {"type": "unicode", "form": "nfc"}],
        "vocab": [
            {"value": "a", "score": -1.5, "keep": True},
            {"value": "b", "score": -2.0},
            {"value": "/v8", "score": -3.25, "encoded": True},
        ],
    }
    tok = Tokenizer.from_str(_json.dumps(obj, indent=2))
    assert tok.base_vocab_size() == 3
    assert tok.model.vocab[0].keep is True
    assert tok.model.vocab[1].keep is False
    # "/v8" is STANDARD_NO_PAD base64 for 0xFE 0xFF (reference: src/lib.rs:8)
    assert tok.model.vocab[2].value == b"\xfe\xff"
    # Round-trips back through our writer and reloads identically.
    back = Tokenizer.from_str(tok.to_string())
    assert [t.value for t in back.model.vocab] == [t.value for t in tok.model.vocab]
    assert [t.keep for t in back.model.vocab] == [t.keep for t in tok.model.vocab]
    assert _json.loads(tok.to_string())["vocab"][2]["value"] == "/v8"


def test_splitter_multibyte_boundaries():
    # Specials adjacent to multibyte chars: char-boundary scanning must
    # not split inside a UTF-8 sequence.
    specials = ["<s>"]
    got = list(split_special_tokens("你好<s>世界", specials))
    assert got == [("你好", False), ("<s>", True), ("世界", False)]
    got2 = list(split_special_tokens("<s>你<s>", specials))
    assert got2 == [("<s>", True), ("你", False), ("<s>", True)]


def test_splitter_multibyte_special_token():
    # Special tokens may themselves contain multibyte characters.
    specials = ["<好>"]
    got = list(split_special_tokens("a<好>b", specials))
    assert got == [("a", False), ("<好>", True), ("b", False)]


def test_encode_batch_host_routes_through_model_batch():
    # reference: src/tokenizer.rs:102-111 — encode_batch is par_iter over
    # texts. The host path must gather every ordinary span across the
    # batch into ONE model.encode_batch call (threaded C++ when
    # available) and stitch specials back, matching per-text encode
    # exactly.
    tok = _make_tokenizer()
    texts = [
        "hello world<eos>hello",
        "<fim>hello\r\n world",
        "",
        "<eos><fim>",
        "hell world hello",
    ]
    want = [tok.encode(t) for t in texts]
    assert tok.encode_batch(texts) == want

    calls = []
    orig = tok.model.encode_batch

    def spy(spans, dropout=0.0):
        calls.append(list(spans))
        return orig(spans, dropout)

    tok.model.encode_batch = spy
    assert tok.encode_batch(texts) == want
    assert len(calls) == 1  # one batched model call, not a per-text loop

    tok.model.encode_batch = orig
    ordinary = [tok.encode_ordinary(t) for t in texts]
    assert tok.encode_ordinary_batch(texts) == ordinary
    # dropout path stays available (statistical equality not required,
    # but every id must decode back to the input sans specials).
    outs = tok.encode_batch(texts, dropout=0.5)
    for t, ids in zip(texts, outs):
        assert tok.decode(ids, include_special_tokens=True) == \
            t.replace("\r\n", "\n")
