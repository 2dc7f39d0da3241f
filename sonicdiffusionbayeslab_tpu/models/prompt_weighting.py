"""Prompt attention weighting — ``(word:1.3)`` / ``(word)`` / ``[word]``.

Beyond-reference UX feature (the A1111/compel convention diffusion users
expect): emphasis syntax parses into per-token weights, the text encoder's
hidden states are scaled per token, and the sequence is renormalized to its
original mean so overall conditioning magnitude is preserved.

Grammar (A1111 semantics):
  (text)        weight x 1.1 (nesting multiplies)
  ((text))      weight x 1.21
  [text]        weight x 1/1.1
  (text:1.5)    explicit weight for the span (overrides the 1.1 factor)
  \\( \\) \\[ \\]   literal brackets

A prompt with no syntax parses to a single weight-1.0 segment and takes a
bit-identical path (no rescale applied).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np

ROUND_FACTOR = 1.1
SQUARE_FACTOR = 1.0 / 1.1

_TOKEN_RE = re.compile(
    r"""
    \\\(|\\\)|\\\[|\\\]   # escaped brackets -> literal
    |\(|\[                 # open emphasis
    |:\s*([+-]?[\d.]+)\s*\)   # explicit weight close (A1111 accepts .5)
    |\)|\]                 # plain close
    |[^\\()\[\]:]+         # text run
    |:                     # bare colon (literal)
    |\\                    # trailing backslash (literal)
    """,
    re.VERBOSE,
)


def parse_segments(text: str) -> List[Tuple[str, float]]:
    """[(text, weight)] with adjacent equal-weight runs merged."""
    segments: List[List] = []  # [text, weight]
    round_stack: List[int] = []  # indices of first segment inside each (
    square_stack: List[int] = []

    def scale(start: int, factor: float) -> None:
        for seg in segments[start:]:
            seg[1] *= factor

    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        explicit = m.group(1)
        if tok.startswith("\\") and len(tok) == 2:
            segments.append([tok[1], 1.0])
        elif tok == "(":
            round_stack.append(len(segments))
        elif tok == "[":
            square_stack.append(len(segments))
        elif explicit is not None:
            try:
                w_val = float(explicit)
            except ValueError:  # e.g. "1.2.3" — treat literally
                w_val = None
            if round_stack and w_val is not None:
                scale(round_stack.pop(), w_val)
            else:
                # No open paren (a literal ':3)' smiley) or unparsable
                # weight: the text stays literal, nothing is rescaled.
                segments.append([tok, 1.0])
        elif tok == ")":
            if round_stack:
                scale(round_stack.pop(), ROUND_FACTOR)
            else:
                segments.append([")", 1.0])
        elif tok == "]":
            if square_stack:
                scale(square_stack.pop(), SQUARE_FACTOR)
            else:
                segments.append(["]", 1.0])
        else:
            segments.append([tok, 1.0])
    # Unclosed brackets: apply their factor to the rest (A1111 behavior).
    for start in round_stack:
        scale(start, ROUND_FACTOR)
    for start in square_stack:
        scale(start, SQUARE_FACTOR)

    merged: List[Tuple[str, float]] = []
    for text_part, w in segments:
        if merged and abs(merged[-1][1] - w) < 1e-9:
            merged[-1] = (merged[-1][0] + text_part, w)
        else:
            merged.append((text_part, w))
    return [(t, w) for t, w in merged if t]


def weighted_ids(tokenizer, text: str) -> Tuple[List[int], List[float]]:
    """Token ids (BOS ... EOS, untruncated-then-clipped like the plain path)
    + per-token weights aligned with them."""
    ids: List[int] = [tokenizer.bos]
    w: List[float] = [1.0]
    for seg_text, seg_w in parse_segments(text):
        seg_ids = tokenizer.encode(seg_text)
        ids.extend(seg_ids)
        w.extend([seg_w] * len(seg_ids))
    limit = tokenizer.max_length - 1
    ids, w = ids[:limit], w[:limit]
    ids.append(tokenizer.eos)
    w.append(1.0)
    return ids, w


def batch_weighted_ids(tokenizer, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """-> (ids [B, T] int32 padded with EOS, weights [B, T] float32)."""
    T = tokenizer.max_length
    out = np.full((len(texts), T), tokenizer.eos, np.int32)
    weights = np.ones((len(texts), T), np.float32)
    for i, t in enumerate(texts):
        ids, w = weighted_ids(tokenizer, t)
        out[i, : len(ids)] = ids
        weights[i, : len(w)] = w
    return out, weights


def apply_prompt_weights(states, weights):
    """states [B, T, C] x weights [B, T] -> scaled states with the original
    per-sample mean restored (A1111 renormalization)."""
    import jax.numpy as jnp

    w = jnp.asarray(weights)[:, :, None]
    orig_mean = states.mean(axis=(1, 2), keepdims=True)
    z = states * w
    new_mean = z.mean(axis=(1, 2), keepdims=True)
    safe = jnp.where(jnp.abs(new_mean) < 1e-8, 1.0, new_mean)
    return z * (orig_mean / safe)
