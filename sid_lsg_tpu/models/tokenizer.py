"""CLIP BPE tokenizer — self-contained, no transformers dependency at runtime.

Replaces the HF ``AutoTokenizer`` the reference loads at
``training/sid_sd_util.py:58-63`` and calls per batch
(sid_sd_util.py:170,221-240): lowercased whitespace-normalised text ->
byte-pair-encoded ids, bracketed by start/end tokens and padded to
``model_max_length`` (77).

Vocab/merges load from a local tokenizer dir (``vocab.json`` +
``merges.txt``, the layout of every SD checkpoint's ``tokenizer/``
subfolder).  SD1.5 pads with <|endoftext|>; SD2.x pads with "!" (id 0) —
``pad_token_id`` is configurable for that reason.

Tokenisation is host-side data prep (it feeds device arrays); the hot 30k
prompt eval path can optionally route through the C++ tokenizer in
``sid_lsg_tpu/native`` (same algorithm, same output ids).  For tests and
offline smoke there is ``HashTokenizer`` — a deterministic stand-in with the
same interface and padding semantics.
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import os
from typing import List, Sequence

import numpy as np


@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte -> printable unicode map (GPT-2/CLIP standard)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _whitespace_clean(text: str) -> str:
    import re

    return re.sub(r"\s+", " ", text).strip()


def get_pairs(word: Sequence[str]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class CLIPTokenizer:
    """BPE tokenizer over a local SD ``tokenizer/`` directory."""

    def __init__(
        self,
        tokenizer_dir: str,
        model_max_length: int = 77,
        pad_token: str | None = None,
    ):
        vocab_path = os.path.join(tokenizer_dir, "vocab.json")
        merges_path = os.path.join(tokenizer_dir, "merges.txt")
        with open(vocab_path, encoding="utf-8") as f:
            self.encoder = json.load(f)
        if merges_path.endswith(".gz"):
            merges = gzip.open(merges_path, "rt", encoding="utf-8").read().split("\n")
        else:
            with open(merges_path, encoding="utf-8") as f:
                merges = f.read().split("\n")
        merges = [m for m in merges if m and not m.startswith("#version")]
        self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.cache: dict = {}
        self.model_max_length = model_max_length
        self.bos_token_id = self.encoder.get("<|startoftext|>")
        self.eos_token_id = self.encoder.get("<|endoftext|>")
        # SD1.5 tokenizer_config sets pad == eos; SD2.x uses "!" (id 0).
        cfg_path = os.path.join(tokenizer_dir, "tokenizer_config.json")
        if pad_token is None and os.path.exists(cfg_path):
            with open(cfg_path, encoding="utf-8") as f:
                cfg = json.load(f)
            pt = cfg.get("pad_token")
            if isinstance(pt, dict):
                pt = pt.get("content")
            pad_token = pt
        self.pad_token_id = (
            self.encoder[pad_token] if pad_token in (self.encoder or {}) else self.eos_token_id
        )
        import regex

        self.pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE,
        )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _whitespace_clean(html.unescape(html.unescape(text))).lower()
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        """Batch tokenize -> (B, model_max_length) int32, truncated+padded.

        Matches HF padding='max_length', truncation=True semantics used at
        reference sid_sd_util.py:170: [bos] tokens[:75] [eos] then pad.
        """
        out = np.full((len(prompts), self.model_max_length), self.pad_token_id, dtype=np.int32)
        for i, p in enumerate(prompts):
            ids = self.encode(p)[: self.model_max_length - 2]
            seq = [self.bos_token_id] + ids + [self.eos_token_id]
            out[i, : len(seq)] = seq
        return out


class HashTokenizer:
    """Deterministic offline stand-in with CLIP-compatible framing.

    Maps each whitespace word to a stable id in [4, vocab). Used by tests and
    CPU smoke paths where no vocab files exist; NOT for real checkpoints.
    """

    def __init__(self, vocab_size: int = 1000, model_max_length: int = 77):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 2

    def encode(self, text: str) -> List[int]:
        import hashlib

        ids = []
        for w in _whitespace_clean(text).lower().split(" "):
            if not w:
                continue
            h = int(hashlib.md5(w.encode()).hexdigest(), 16)
            ids.append(4 + h % (self.vocab_size - 4))
        return ids

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        out = np.full((len(prompts), self.model_max_length), self.pad_token_id, dtype=np.int32)
        for i, p in enumerate(prompts):
            ids = self.encode(p)[: self.model_max_length - 2]
            seq = [self.bos_token_id] + ids + [self.eos_token_id]
            out[i, : len(seq)] = seq
        return out


def load_tokenizer(model_dir_or_preset: str, model_max_length: int = 77):
    """Tokenizer factory: SD checkpoint dir -> CLIPTokenizer (wrapped in the
    native ASCII fast path when the C++ library builds), else HashTokenizer."""
    tok_dir = os.path.join(model_dir_or_preset, "tokenizer")
    if not os.path.isdir(tok_dir):
        tok_dir = model_dir_or_preset
    if os.path.isdir(tok_dir) and os.path.exists(os.path.join(tok_dir, "vocab.json")):
        py = CLIPTokenizer(tok_dir, model_max_length=model_max_length)
        from ..native import NativeTokenizer, native_available

        return NativeTokenizer(py) if native_available() else py
    return HashTokenizer(model_max_length=model_max_length)
