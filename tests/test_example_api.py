"""End-to-end API smoke test, asserting everything the reference's
bindings example exercises (reference: bindings/python/example.py)."""

import pickle

from tokengeex_tpu import Model, ScoredToken, Tokenizer, new_default_vocab


def _tokenizer():
    vocab = [ScoredToken(bytes([b]), -12.0) for b in range(256)]
    for w, s in [(b"Hello", -3.0), (b", ", -3.5), (b"world", -3.0),
                 (b"!", -4.0), (b"self.", -3.2), (b"dropout", -3.4),
                 (b"self", -5.0), (b"s", -8.0), (b"se", -7.5)]:
        vocab.append(ScoredToken(w, s))
    return Tokenizer(Model(vocab), [], [])


def test_example_flow():
    tokenizer = _tokenizer()
    sentence = "Hello, world!"

    ids = tokenizer.encode_ordinary(sentence, 0.0)
    assert all(tokenizer.id_to_token(i) is not None for i in ids)

    # dropout smoke: still roundtrips
    ids_d = tokenizer.encode(sentence, 0.5)
    assert tokenizer.decode(ids_d, include_special_tokens=False) == sentence

    # Vocabulary
    tid = tokenizer.base_token_to_id(b"Hello")
    assert tid is not None
    assert tokenizer.id_to_base_token(tid).value == b"Hello"
    vocab_size = tokenizer.vocab_size()

    # Special tokens
    special_tokens = ["<s>", "</s>", "<pad>", "<unk>"]
    tokenizer.add_special_tokens(special_tokens)
    assert tokenizer.special_tokens() == special_tokens
    sid = tokenizer.special_token_to_id("<s>")
    assert sid is not None

    wrapped = "<s>Hello, world!</s>"
    ids = tokenizer.encode(wrapped, 0.0)
    assert ids[0] == sid
    assert ids[-1] == tokenizer.special_token_to_id("</s>")

    ids_ord = tokenizer.encode_ordinary(wrapped, 0.0)
    assert ids_ord[0] != sid and ids_ord[-1] != tokenizer.special_token_to_id("</s>")

    assert vocab_size == tokenizer.vocab_size() - len(special_tokens)
    assert tokenizer.id_to_special_token(sid) == "<s>"
    assert tokenizer.is_special(sid)
    assert not tokenizer.is_base(sid)
    assert tokenizer.special_vocab_size() == 4
    assert tokenizer.base_vocab_size() == vocab_size

    # Batch
    sentences = ["<s>Hello, world!</s>", "<s>Hello, world!</s>"]
    idss = tokenizer.encode_batch(sentences, 0.0)
    assert tokenizer.decode_batch(idss, include_special_tokens=True) == sentences
    assert tokenizer.decode_batch(idss, include_special_tokens=False) == [
        "Hello, world!", "Hello, world!"]
    tokenizer.encode_ordinary_batch(sentences, 0.0)

    # Common prefix search yields increasing-length matches of "self.dropout"
    matches = list(tokenizer.common_prefix_search("self.dropout"))
    values = [tokenizer.model.vocab[i].value for i, _ in matches]
    assert values == [b"s", b"se", b"self", b"self."]

    # Pickle roundtrip (reference: bindings/python/src/lib.rs:196-223)
    restored = pickle.loads(pickle.dumps(tokenizer))
    assert restored.encode(wrapped, 0.0) == tokenizer.encode(wrapped, 0.0)


def test_special_tokens_add_is_idempotent():
    tokenizer = _tokenizer()
    tokenizer.add_special_tokens(["<s>", "<s>", "</s>"])
    assert tokenizer.special_tokens() == ["<s>", "</s>"]
    assert tokenizer.special_vocab_size() == 2
