"""Native CLIP BPE tokenizer parity vs transformers (VERDICT r2 missing #5
/ next #8).

The real CLIP vocab is a 49k external artifact (zero egress), but its
FORMAT is fully determined: base alphabet = the 256 byte-unicode symbols
plus each with ``</w>``, then ranked merges, then bos/eos. We construct a
vocab with exactly that structure (full byte alphabet so every unicode
string round-trips through byte fallback, plus real merges) and require
``CLIPBPETokenizer`` to match ``transformers.CLIPTokenizer`` token-for-
token on the same files across byte-fallback, merge, contraction-split,
unicode, truncation, and padding cases. transformers' slow tokenizer is
the canonical reader of this format — matching it on a
structure-identical vocab is the strongest offline proof the real
``vocab.json``/``merges.txt`` will tokenize identically
(reference ``delete_sd.py:425-430,937-944``).
"""

import json
import os

import numpy as np
import pytest

from siss_tpu.models.clip_bpe import CLIPBPETokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clipvocab")
    # exactly the real vocab's construction: 256 byte symbols, then each
    # with </w>, then merged tokens in merge order, then bos/eos
    byte_syms = [bytes_to_unicode()[b] for b in range(256)]
    vocab = {}
    for s in byte_syms:
        vocab[s] = len(vocab)
    for s in byte_syms:
        vocab[s + "</w>"] = len(vocab)
    merges = [
        # build "photo</w>" bottom-up plus partial merges for other words
        "p h", "ph o", "t o</w>", "pho t", "phot o</w>",
        "c a", "a t</w>", "ca t</w>",
        "o f</w>",
        "t h", "th e</w>",
        "i n", "in g</w>",
        "2 3</w>",  # digit merge that must NEVER fire: [\p{N}] splits digits
        "' s</w>",  # contraction merge ('s is its own regex token)
        "e ́",       # combining-accent merge that must never fire post-NFC
    ]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(tmp / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(tmp / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(tmp)


TRICKY = [
    "a photo of a cat",
    "A PHOTO OF A CAT",                      # lowercasing
    "  weird   spacing\tand\nnewlines  ",    # whitespace cleanup
    "the cat's photo",                       # 's contraction split
    "it's, isn't; \"quoted\"!",              # punctuation runs
    "café crème déjà",                 # NFC + accents via byte fallback
    "emoji 🎨🖼️ and 中文字",                  # multibyte utf-8, CJK
    "123 456.789",                           # digits split one at a time
    "photo photo photo " * 30,               # truncation at max_length
    "ingesting the cathode",                 # partial-merge interactions
    "<|endoftext|>",                         # special token passthrough
    "",                                      # empty prompt (uncond path)
    "naïve façade — em–dash…",
]


def test_native_matches_transformers(vocab_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer(os.path.join(vocab_dir, "vocab.json"),
                                    os.path.join(vocab_dir, "merges.txt"))
    ours = CLIPBPETokenizer(os.path.join(vocab_dir, "vocab.json"),
                            os.path.join(vocab_dir, "merges.txt"))
    assert ours.bos_token_id == hf.bos_token_id
    assert ours.eos_token_id == hf.eos_token_id
    for text in TRICKY:
        theirs = hf(text, padding="max_length", max_length=77,
                    truncation=True, return_tensors="np")
        mine = ours(text, padding="max_length", max_length=77,
                    truncation=True, return_tensors="np")
        np.testing.assert_array_equal(
            mine.input_ids, theirs.input_ids,
            err_msg=f"input_ids mismatch for {text!r}: "
                    f"{hf.tokenize(text)} vs {ours.tokenize(text)}")
        np.testing.assert_array_equal(mine.attention_mask, theirs.attention_mask,
                                      err_msg=f"mask mismatch for {text!r}")


def test_short_max_length_truncation(vocab_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer(os.path.join(vocab_dir, "vocab.json"),
                                    os.path.join(vocab_dir, "merges.txt"))
    ours = CLIPBPETokenizer(os.path.join(vocab_dir, "vocab.json"),
                            os.path.join(vocab_dir, "merges.txt"))
    for n in (3, 8, 16):
        a = hf("a photo of a cat in the photo", padding="max_length",
               max_length=n, truncation=True, return_tensors="np").input_ids
        b = ours("a photo of a cat in the photo", padding="max_length",
                 max_length=n, truncation=True, return_tensors="np").input_ids
        np.testing.assert_array_equal(b, a)


def test_batch_and_decode_roundtrip(vocab_dir):
    ours = CLIPBPETokenizer(os.path.join(vocab_dir, "vocab.json"),
                            os.path.join(vocab_dir, "merges.txt"))
    enc = ours(["a cat", "a photo of the cat"], max_length=16)
    assert enc.input_ids.shape == (2, 16)
    assert ours.decode(enc.input_ids[1]) == "a photo of the cat"


def test_load_clip_tokenizer_prefers_native(vocab_dir):
    from siss_tpu.models.clip_bpe import CLIPBPETokenizer as Native
    from siss_tpu.models.clip_text import load_clip_tokenizer

    tok = load_clip_tokenizer(vocab_dir)
    assert isinstance(tok, Native)
