"""From-scratch CLIP byte-level BPE tokenizer (no transformers dependency).

The reference tokenizes prompts with HF ``CLIPTokenizer`` loaded from the
SD checkpoint's ``tokenizer/`` folder (``delete_sd.py:425-430,937-944``).
This is a native reimplementation of the exact same algorithm — the
OpenAI CLIP byte-level BPE over ``vocab.json``/``merges.txt``:

1. clean: drop control/invalid chars, map all whitespace to " ", NFC
   normalize, lowercase, collapse runs of whitespace;
2. split with CLIP's regex (contractions / letter-runs / single digits /
   punctuation runs; whitespace never enters a token);
3. per word: utf-8 bytes → printable-unicode symbols (GPT-2
   ``bytes_to_unicode`` table), then greedy lowest-rank BPE merges with a
   ``</w>`` marker on the final symbol;
4. vocab lookup (unknown pieces → ``<|endoftext|>``), wrap with
   ``<|startoftext|>`` … ``<|endoftext|>``, truncate to ``max_length``
   (always keeping the final eos), pad with the eos id.

Parity with ``transformers.CLIPTokenizer`` on the same vocab files is
enforced by ``tests/test_clip_bpe_parity.py`` (byte-level fallback vocab +
merged-word vocab, unicode/punctuation/truncation edge cases).
"""

from __future__ import annotations

import functools
import json
import os
import unicodedata
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

try:  # \p{L}/\p{N} classes need the `regex` module (stdlib `re` lacks them)
    import regex as _re
except ImportError:  # pragma: no cover
    _re = None

_BOS = "<|startoftext|>"
_EOS = "<|endoftext|>"

_PAT = (r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+")


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte↔printable-unicode table: the 188 printable
    latin-1 bytes map to themselves, the rest shift up past U+0100 so no
    BPE symbol is ever whitespace/control."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def _clean(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        cat = unicodedata.category(ch)
        if cp in (0, 0xFFFD) or (cat in ("Cc", "Cf") and ch not in ("\t", "\n", "\r")):
            continue
        if _is_cjk(cp):
            # CJK chars become standalone words (each gets its own </w>) —
            # matches HF's no-ftfy CLIPTokenizer branch, the behavior any
            # ftfy-less install of the reference stack produces
            out.extend((" ", ch, " "))
        else:
            out.append(" " if (ch in " \t\n\r" or cat == "Zs") else ch)
    text = unicodedata.normalize("NFC", "".join(out)).lower()
    return " ".join(text.split())


class _Encoding:
    """Minimal stand-in for HF's BatchEncoding: just the two arrays."""

    def __init__(self, input_ids: np.ndarray, attention_mask: np.ndarray):
        self.input_ids = input_ids
        self.attention_mask = attention_mask

    def __getitem__(self, key):
        return {"input_ids": self.input_ids, "attention_mask": self.attention_mask}[key]


class CLIPBPETokenizer:
    """Callable with the HF surface the pipeline uses:
    ``tok(texts, padding="max_length", max_length=77, truncation=True,
    return_tensors="np").input_ids``."""

    def __init__(self, vocab_file: str, merges_file: str, model_max_length: int = 77):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        with open(merges_file, encoding="utf-8") as f:
            merges = f.read().strip().split("\n")[1:49152 - 256 - 2 + 1]
        self.bpe_ranks: Dict[Tuple[str, str], int] = {
            tuple(m.split()): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.model_max_length = model_max_length
        self.bos_token_id = self.encoder.get(_BOS)
        self.eos_token_id = self.encoder.get(_EOS)
        self.unk_token_id = self.eos_token_id
        self.pad_token_id = self.eos_token_id
        self._cache: Dict[str, List[str]] = {_BOS: [_BOS], _EOS: [_EOS]}
        if _re is None:
            raise ImportError("CLIPBPETokenizer requires the `regex` module")
        self._pat = _re.compile(_PAT, _re.IGNORECASE)

    # ---------------------------------------------------------------- bpe
    def _bpe(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            self._cache[token] = list(word)
            return list(word)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        self._cache[token] = list(word)
        return list(word)

    # ------------------------------------------------------------- encode
    def tokenize(self, text: str) -> List[str]:
        pieces: List[str] = []
        for tok in self._pat.findall(_clean(text)):
            sym = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            pieces.extend(self._bpe(sym))
        return pieces

    def encode(self, text: str, max_length: int, truncation: bool = True) -> List[int]:
        ids = [self.encoder.get(p, self.unk_token_id) for p in self.tokenize(text)]
        if truncation and len(ids) > max_length - 2:
            ids = ids[:max_length - 2]
        return [self.bos_token_id] + ids + [self.eos_token_id]

    def __call__(self, texts: Union[str, Sequence[str]], padding: str = "max_length",
                 max_length: int = None, truncation: bool = True,
                 return_tensors: str = "np") -> _Encoding:
        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.model_max_length
        rows, masks = [], []
        for t in texts:
            ids = self.encode(t, max_length, truncation=truncation)
            mask = [1] * len(ids)
            if padding == "max_length" and len(ids) < max_length:
                pad = max_length - len(ids)
                ids = ids + [self.pad_token_id] * pad
                mask = mask + [0] * pad
            rows.append(ids)
            masks.append(mask)
        return _Encoding(np.asarray(rows, np.int64), np.asarray(masks, np.int64))

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        decoder = {v: k for k, v in self.encoder.items()}
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        toks = [decoder.get(int(i), "") for i in ids]
        if skip_special_tokens:
            toks = [t for t in toks if t not in (_BOS, _EOS)]
        text = "".join(toks)
        raw = bytearray(byte_decoder[c] for c in text if c in byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()


def load_native_clip_tokenizer(path: str) -> CLIPBPETokenizer:
    """Load from a directory holding ``vocab.json`` + ``merges.txt`` (the
    layout inside every SD checkpoint's ``tokenizer/`` folder)."""
    return CLIPBPETokenizer(os.path.join(path, "vocab.json"),
                            os.path.join(path, "merges.txt"))
