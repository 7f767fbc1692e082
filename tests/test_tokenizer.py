"""Offline WordPiece tokenizer golden tests (VERDICT r1 item 5).

Pins data/tokenizer.py token-for-token against ``transformers.BertTokenizer``
(the slow, pure-Python implementation, constructible from a local vocab.txt
with zero network) plus hand-computed goldens, so a vendored
bert-base-uncased vocab.txt reproduces the reference tokenization
(hateful_discussions.py:47,160-166) exactly.
"""

import numpy as np
import pytest

from multimodaldiscussiontransformer_tpu.data.tokenizer import (
    BertWordPieceTokenizer,
    find_vocab,
)

# a vocab exercising CLS/SEP framing, ##continuations, punctuation splits,
# accent stripping, unks, and CJK spacing
VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##ed", "##s", "##ing",
    "over", "lazy", "dog", "!", ",", ".", "'", "un", "##aff", "##able",
    "##ord", "hello", "world", "re", "##ddit", "na", "##ive", "$", "1",
    "##0", "中", "国",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(p)


@pytest.fixture(scope="module")
def tok(vocab_file):
    return BertWordPieceTokenizer(vocab_file)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    from transformers import BertTokenizer

    return BertTokenizer(vocab_file, do_lower_case=True)


CASES = [
    "The quick brown fox jumped over the lazy dog!",
    "unaffable",  # greedy longest-match: un ##aff ##able
    "unaffordable hello,world.",  # punctuation splitting mid-string
    "Naïve RÉSUMÉ",  # accent stripping + lowercasing
    "hello   \t\n world",  # whitespace collapsing
    "zzzqqq unknownword",  # full-word [UNK]s
    "$10 jumps, jumping & jumped!",
    "中国 hello",  # CJK chars split to singles
    "",  # empty text -> [CLS] [SEP] only
    "the " * 300,  # truncation at max_length
]


def test_tokens_match_hf_slow(tok, hf_tok):
    for text in CASES:
        assert tok.tokenize(text) == hf_tok.tokenize(text), text


def test_encoding_matches_hf_slow(tok, hf_tok):
    enc = tok(CASES, max_length=16)
    ref = hf_tok(
        CASES,
        padding="max_length",
        truncation=True,
        max_length=16,
        return_tensors="np",
    )
    np.testing.assert_array_equal(enc["input_ids"], ref["input_ids"])
    np.testing.assert_array_equal(
        enc["attention_mask"], ref["attention_mask"]
    )
    np.testing.assert_array_equal(
        enc["token_type_ids"], ref["token_type_ids"]
    )


def test_hand_computed_goldens(tok):
    # greedy longest-match-first
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert tok.tokenize("jumped jumps") == ["jump", "##ed", "jump", "##s"]
    # punctuation split + lowercase
    assert tok.tokenize("Hello,world!") == ["hello", ",", "world", "!"]
    # accents stripped before wordpiece
    assert tok.tokenize("naïve") == ["na", "##ive"]
    # unknown word collapses to [UNK] (no partial match emission)
    assert tok.tokenize("naq") == ["[UNK]"]
    # CJK one-char tokens
    assert tok.tokenize("中国") == ["中", "国"]


def test_encode_frames_and_pads(tok):
    enc = tok.encode("the fox", max_length=8)
    ids = enc["input_ids"]
    assert ids[0] == tok.cls_id
    assert list(ids[:4]) == [
        tok.cls_id,
        tok.vocab["the"],
        tok.vocab["fox"],
        tok.sep_id,
    ]
    assert (ids[4:] == tok.pad_id).all()
    assert list(enc["attention_mask"]) == [1, 1, 1, 1, 0, 0, 0, 0]


def test_truncation_keeps_sep(tok):
    enc = tok.encode("the " * 50, max_length=10)
    ids = enc["input_ids"]
    assert ids[0] == tok.cls_id and ids[9] == tok.sep_id
    assert (enc["attention_mask"] == 1).all()


def test_ingest_prefers_wordpiece(vocab_file, monkeypatch):
    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.ingest import (
        make_tokenizer,
    )

    monkeypatch.setenv("MDT_BERT_VOCAB", vocab_file)
    t = make_tokenizer("bert-base-uncased")
    assert isinstance(t, BertWordPieceTokenizer)
    monkeypatch.delenv("MDT_BERT_VOCAB")
    assert find_vocab() is None


def test_fuzz_against_hf_slow(tok, hf_tok):
    """Randomized strings (unicode letters, accents, CJK, punctuation,
    digits, odd whitespace/controls) must tokenize identically to the HF
    slow tokenizer."""
    import random

    rng = random.Random(0)
    alphabet = (
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJ")
        + list("0123456789")
        + list(".,!?;:'\"()[]{}$%&/\\-_+=<>@#~^|")
        + list(" \t\n\r\x0b  ")
        + list("àéîöůñçßÆŒ")
        + list("中国日本語한국")
        + ["́", "̈"]  # combining marks
        + ["\x00", "�", "\x07"]  # control/replacement chars
    )
    for _ in range(300):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        assert tok.tokenize(text) == hf_tok.tokenize(text), repr(text)


def test_hash_fallback_requires_explicit_opt_in(monkeypatch):
    """make_tokenizer must raise rather than silently hand back the
    vocab-INCOMPATIBLE HashTokenizer (reference contract: real WordPiece,
    hateful_discussions.py:160-166)."""
    import pytest
    import transformers

    from multimodaldiscussiontransformer_tpu.experiments.hateful_discussions.ingest import (
        HashTokenizer,
        make_tokenizer,
    )

    monkeypatch.delenv("MDT_BERT_VOCAB", raising=False)
    monkeypatch.delenv("MDT_ALLOW_DOWNLOAD", raising=False)

    def no_cache(*a, **k):
        raise OSError("no local cache")

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained", no_cache
    )
    with pytest.raises(RuntimeError, match="HashTokenizer"):
        make_tokenizer("bert-base-uncased")
    # the two explicit opt-ins still work
    t = make_tokenizer("bert-base-uncased", allow_hash_fallback=True)
    assert isinstance(t, HashTokenizer)
    assert isinstance(make_tokenizer("__offline__"), HashTokenizer)
