"""Tests for tokenizer, token buffer, and sampling semantics."""
import numpy as np
import pytest

from fastllama_tpu.engine.tokenizer import (
    BOS_ID, Vocab, detokenize, tokenize, utf8_len,
)
from fastllama_tpu.engine.token_buffer import (
    TokenBuffer, TokenBufferPartialState, _split_trailing_incomplete_utf8,
)
from fastllama_tpu.engine.sampling import SamplingParams, sample_host


def make_vocab(entries):
    """entries: list of (text, score); ids follow list order after 3 specials
    + 256 byte tokens, mimicking a SentencePiece id layout loosely."""
    toks = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    toks += [(bytes([i]), -1e6) for i in range(256)]  # byte-fallback range
    toks += [(t.encode() if isinstance(t, str) else t, s) for t, s in entries]
    return Vocab.from_tokens(toks)


BASE = 259  # first id after specials + bytes


def test_utf8_len_table():
    assert utf8_len(ord("a")) == 1
    assert utf8_len(0xC3) == 2
    assert utf8_len(0xE2) == 3
    assert utf8_len(0xF0) == 4


def test_tokenize_greedy_merge():
    v = make_vocab([("a", 1.0), ("b", 1.0), ("c", 1.0),
                    ("ab", 5.0), ("abc", 3.0)])
    # "ab" merges first (score 5), then "ab"+"c" -> "abc" (score 3)
    assert tokenize(v, "abc") == [BASE + 4]


def test_tokenize_score_priority():
    v = make_vocab([("a", 1.0), ("b", 1.0), ("c", 1.0),
                    ("ab", 2.0), ("bc", 9.0)])
    # "bc" has the higher score: "a" + "bc"
    assert tokenize(v, "abc") == [BASE + 0, BASE + 4]


def test_tokenize_bos():
    v = make_vocab([("a", 1.0)])
    assert tokenize(v, "a", bos=True) == [BOS_ID, BASE + 0]
    assert tokenize(v, "", bos=True) == []   # empty returns empty (ref behavior)


def test_tokenize_byte_fallback():
    v = make_vocab([("a", 1.0)])
    # "z" not in vocab as a merged token: the tokenizer finds the raw byte
    # via token_to_id (ids 3..258 are byte tokens here), so check a byte NOT
    # present at all by using a vocab without byte tokens.
    v2 = Vocab.from_tokens([(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0),
                            (b"a", 1.0)])
    assert tokenize(v2, "az") == [3, ord("z") + 3]


def test_tokenize_multibyte_utf8():
    v = Vocab.from_tokens([(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)])
    # é = 0xC3 0xA9 — no vocab entry: two byte-fallback ids
    assert tokenize(v, "é") == [0xC3 + 3, 0xA9 + 3]


def test_detokenize_roundtrip():
    v = make_vocab([("hello", 2.0), (" world", 2.0)])
    ids = tokenize(v, "hello world")
    assert detokenize(v, ids) == b"hello world"


# -- token buffer -----------------------------------------------------------

def test_split_trailing_incomplete():
    assert _split_trailing_incomplete_utf8(b"abc") == (b"abc", b"")
    assert _split_trailing_incomplete_utf8(b"ab\xc3") == (b"ab", b"\xc3")
    assert _split_trailing_incomplete_utf8("aé".encode()) == ("aé".encode(), b"")
    assert _split_trailing_incomplete_utf8(b"a\xe2\x82") == (b"a", b"\xe2\x82")


def test_token_buffer_stream_and_stop():
    v = make_vocab([("Hel", 1.0), ("lo ", 1.0), ("STOP", 1.0), ("!", 1.0)])
    out = []
    tb = TokenBuffer(v, max_buffer_size=2, fn=out.append)
    hel, lo, stop, bang = BASE, BASE + 1, BASE + 2, BASE + 3
    for t in (hel, lo):
        tb.add(t)
    found, before, after = tb.scan_stop_words([b"STOP"])
    assert not found
    tb.add(stop)       # exceeds max -> flushes "Hel"
    assert out == ["Hel"]
    found, before, after = tb.scan_stop_words([b"STOP"])
    assert found
    assert before == b"lo "
    assert after == b""


def test_token_buffer_stop_word_spanning_tokens():
    v = make_vocab([("ST", 1.0), ("OP", 1.0), ("x", 1.0)])
    out = []
    tb = TokenBuffer(v, max_buffer_size=4, fn=out.append)
    tb.add(BASE + 2)   # x
    tb.add(BASE + 0)   # ST
    tb.add(BASE + 1)   # OP
    found, before, after = tb.scan_stop_words([b"STOP"])
    assert found and before == b"x" and after == b""


def test_token_buffer_utf8_backlog():
    # a token ending mid-UTF8 must hold back the partial bytes
    v = Vocab.from_tokens([(b"<unk>", 0), (b"<s>", 0), (b"</s>", 0),
                           (b"a\xc3", 0.0), (b"\xa9b", 0.0)])
    out = []
    tb = TokenBuffer(v, max_buffer_size=0, fn=out.append)
    tb.add(3)          # queued; flush happens on the *next* add (ref semantics)
    assert out == []
    tb.add(4)          # flushes token 3: "a" out, 0xC3 held back
    assert out == ["a"]
    tb.flush_all()     # 0xC3 + 0xA9 = é, then "b"
    assert "".join(out) == "aéb"


def test_token_buffer_partial_state_resume():
    v = make_vocab([("x", 1.0)])
    out = []
    tb = TokenBuffer(v, 2, out.append)
    st = TokenBufferPartialState(left_out=b"tail text")
    tb.restore_partial_state(st)
    assert out == ["tail text"]


# -- sampling ---------------------------------------------------------------

def test_sample_greedy():
    logits = np.array([0.1, 5.0, 0.2], np.float32)
    p = SamplingParams(temp=0.0)
    rng = np.random.default_rng(0)
    assert sample_host(logits, [], p, rng) == 1
    # greedy ignores the penalty window (reference: early return, bridge.cpp:39)
    assert sample_host(logits, [1], SamplingParams(temp=0.0, repeat_penalty=5.0),
                       rng) == 1


def test_sample_repetition_penalty_flips_argmax():
    logits = np.zeros(8, np.float32)
    logits[0] = 5.0
    logits[1] = 4.0
    p = SamplingParams(temp=0.001, top_k=1, top_p=1.0, repeat_penalty=2.0)
    rng = np.random.default_rng(0)
    # token 0 penalized (positive logit -> divided): 2.5 < 4.0 -> pick 1
    assert sample_host(logits, [0], p, rng) == 1
    # negative logits are multiplied (made more negative)
    logits2 = -np.ones(8, np.float32)
    logits2[2] = -0.5
    logits2[3] = -0.6
    assert sample_host(logits2, [2], p, rng) == 3


def test_sample_top_p_inclusive_cut():
    # probs ~ [0.6, 0.3, 0.1]; top_p=0.5 keeps the first entry whose cumsum
    # reaches >= 0.5 (inclusive), i.e. only token 0
    logits = np.log(np.array([0.6, 0.3, 0.1], np.float64)).astype(np.float32)
    p = SamplingParams(temp=1.0, top_k=3, top_p=0.5)
    counts = np.zeros(3, int)
    rng = np.random.default_rng(1)
    for _ in range(200):
        counts[sample_host(logits, [], p, rng)] += 1
    assert counts[0] == 200


def test_sample_distribution_roughly_matches():
    logits = np.log(np.array([0.5, 0.3, 0.2], np.float64)).astype(np.float32)
    p = SamplingParams(temp=1.0, top_k=3, top_p=1.0)
    rng = np.random.default_rng(2)
    counts = np.zeros(3, int)
    n = 3000
    for _ in range(n):
        counts[sample_host(logits, [], p, rng)] += 1
    freq = counts / n
    np.testing.assert_allclose(freq, [0.5, 0.3, 0.2], atol=0.05)
