"""CLIP tokenization: full byte-level BPE (when vocab files are available)
plus a deterministic offline fallback.

The reference gets tokenization from the HF hub via transformers'
CLIPTokenizer inside the diffusers pipeline (src/models.py:139-149); this
environment has no network, so:

* :class:`CLIPBPETokenizer` — a from-scratch implementation of CLIP's BPE
  (lowercase, whitespace-collapse, byte-encode, merge ranks, ``</w>``
  end-of-word convention) loading standard ``vocab.json`` + ``merges.txt``
  files from a local path (e.g. an offline HF snapshot).
* :class:`HashTokenizer` — a deterministic stand-in for weightless testing
  and benchmarking: stable ids from token hashes, same padding contract.

Both produce fixed-length [B, 77] int32 id arrays: BOS, ids, EOS, then
EOS-padding (CLIP's convention).
"""

from __future__ import annotations

import functools
import gzip
import json
import re
from pathlib import Path
from typing import List, Sequence

import numpy as np

_WORD_RE = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
    if False
    else r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
    re.IGNORECASE,
)


@functools.lru_cache()
def _bytes_to_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(
        range(ord("®"), ord("ÿ") + 1)
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class CLIPBPETokenizer:
    """CLIP BPE from local vocab.json + merges.txt(.gz)."""

    def __init__(self, vocab_path: str, merges_path: str, max_length: int = 77):
        with open(vocab_path) as f:
            self.encoder = json.load(f)
        opener = gzip.open if str(merges_path).endswith(".gz") else open
        with opener(merges_path, "rt") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges if m and not m.startswith("#version")]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.max_length = max_length
        self.bos = self.encoder["<|startoftext|>"]
        self.eos = self.encoder["<|endoftext|>"]
        self._cache: dict = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            first, second = best
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        self._cache[token] = list(word)
        return list(word)

    def encode(self, text: str) -> List[int]:
        text = re.sub(r"\s+", " ", text.lower().strip())
        ids: List[int] = []
        for tok in _WORD_RE.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok) if t in self.encoder)
        return ids

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_length), self.eos, dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.bos] + self.encode(t)[: self.max_length - 2] + [self.eos]
            out[i, : len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic offline tokenizer: stable FNV-1a ids per word.

    Not linguistically meaningful — exists so the full pipeline (tokenize ->
    text-encode -> sample -> decode) runs end-to-end and reproducibly
    without hub assets."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos = vocab_size - 2
        self.eos = vocab_size - 1

    def encode(self, text: str) -> List[int]:
        ids = []
        for w in re.findall(r"\S+", text.lower()):
            h = 2166136261
            for c in w.encode("utf-8"):
                h = ((h ^ c) * 16777619) & 0xFFFFFFFF
            ids.append(h % (self.vocab_size - 2))
        return ids

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_length), self.eos, dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.bos] + self.encode(t)[: self.max_length - 2] + [self.eos]
            out[i, : len(ids)] = ids
        return out


def load_tokenizer(local_dir: str | None = None, vocab_size: int = 49408, max_length: int = 77):
    """CLIPBPETokenizer if vocab files exist under ``local_dir``, else
    HashTokenizer (offline fallback, logged by the caller)."""
    if local_dir:
        d = Path(local_dir)
        vocab, merges = d / "vocab.json", d / "merges.txt"
        if vocab.exists() and merges.exists():
            return CLIPBPETokenizer(str(vocab), str(merges), max_length)
    return HashTokenizer(vocab_size, max_length)


class _T5FastTokenizer:
    """Thin wrapper over a local ``tokenizer.json`` (HF tokenizers lib —
    installed; sentencepiece is not, so the slow T5Tokenizer path isn't an
    option offline).  Pads with id 0 (T5's <pad>) to ``max_length`` like
    diffusers' padding='max_length' call."""

    def __init__(self, tokenizer_json: str, max_length: int = 256):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(tokenizer_json)
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.max_length), dtype=np.int32)
        for i, enc in enumerate(self._tok.encode_batch(list(texts))):
            ids = enc.ids[: self.max_length]
            out[i, : len(ids)] = ids
        return out


def load_t5_tokenizer(local_dir: str | None = None, vocab_size: int = 32128,
                      max_length: int = 256):
    """T5 tokenizer from a snapshot's ``tokenizer_3/tokenizer.json`` if
    present, else the HashTokenizer offline fallback."""
    if local_dir:
        tj = Path(local_dir) / "tokenizer.json"
        if tj.exists():
            return _T5FastTokenizer(str(tj), max_length)
    return HashTokenizer(vocab_size, max_length)
