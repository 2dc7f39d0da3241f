"""Token Merging (ToMe) for Stable Diffusion — training-free attention
acceleration (Bolya & Hoffman, "Token Merging for Fast Stable Diffusion",
CVPRW 2023).

The UNet's N=4096 self-attention is the single largest bucket of the hero
profile (29% of step time, docs/PERF.md) and sits at a *structural* 31%
MXU-utilization ceiling (D=40 contraction on a 128-lane systolic array) —
it cannot be made faster at full resolution.  ToMe shrinks N instead:
before attn1, the most redundant `r` tokens are merged into their most
similar neighbours (bipartite soft matching on cosine similarity); the
attention runs over `N - r` tokens; the output is un-merged back to N by
copying each merged destination's output to its sources.

This is an APPROXIMATE method, in the same product family as the
reference's DeepCache/interleave experiments (methods that trade a small,
paper-quantified quality delta for large speed): the reference exposes
those via its `experiments` registry; ToMe is registered the same way
(`tome` method) and as a per-call knob (`tome_ratio`).

tpu-first design notes (vs the CUDA/torch reference implementation):
 - everything is static-shape: `r` is a Python int baked at trace time, so
   the merged token count `N - r` is a compile-time constant and the whole
   sampler still compiles to ONE `lax.scan` program;
 - the bipartite partition is the paper's 2D strided one (one destination
   per sx*sy cell), expressed as a reshape/slice rather than index lists;
 - merge = segment-mean via one-hot matmul.  A [Ns, Nd] one-hot matmul is
   MXU-friendly and XLA-fusable, and at SD shapes (Ns=3072, Nd=1024,
   C=320) costs ~2 GFLOP vs the ~21 GFLOP it removes from attn1 — scatter
   ops would serialize on TPU;
 - the per-cell "random destination" of the paper is a traced index
   derived from a folded PRNG key, so it varies per diffusion step inside
   the scan without retracing;
 - unmerge is ONE gather through a precomputed [B, N] index map (built
   with tiny int32 scatters), not a [B, N, C] scatter pair — scatters of
   the full activation tensor measured ~2x the cost on v5e;
 - the similarity metric is subsampled to `metric_channels` channels
   (cosine similarity concentrates in few dims; the full-C einsum was
   ~15% of the savings by itself) and the matching is computed ONCE per
   step per resolution and shared across that level's transformer blocks
   (`share=True`; the official ToMeSD recomputes per block — measured on
   v5e the recompute costs more than the attention it saves).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["bipartite_soft_matching_2d", "merge_wavg", "TomeConfig"]


class TomeConfig:
    """Static ToMe knobs (hashable — participates in trace-cache keys).

    ratio: fraction of tokens to merge away at eligible resolutions
      (paper default 0.5).
    sx, sy: destination stride (one dst per sx*sy cell; paper default 2).
    max_downsample: apply only at levels whose downsample factor is <=
      this (1 => only the 64x64 / N=4096 level, the paper default — the
      deeper levels are cheap and carry more semantic load).
    rand: per-step random destination choice within each cell (paper's
      use_rand; avoids fixed-grid artifacts).
    metric_channels: similarity is computed on the first this-many feature
      channels (0 = all).  Measured on v5e the full-C similarity einsum is
      a sizeable fraction of ToMe's overhead; 64 channels preserve the
      matching (cosine similarity of natural features concentrates in few
      dims) at 1/5 the cost.
    share: compute the matching once per step per resolution and reuse it
      for every transformer block at that level (the official ToMeSD
      recomputes per block; measured on v5e the per-block recompute costs
      more than the attention it saves).
    """

    __slots__ = ("ratio", "sx", "sy", "max_downsample", "rand",
                 "metric_channels", "share")

    def __init__(self, ratio: float = 0.5, sx: int = 2, sy: int = 2,
                 max_downsample: int = 1, rand: bool = True,
                 metric_channels: int = 64, share: bool = True):
        if not 0.0 < ratio < 1.0:
            raise ValueError(f"tome ratio must be in (0, 1), got {ratio}")
        self.ratio = float(ratio)
        self.sx = int(sx)
        self.sy = int(sy)
        self.max_downsample = int(max_downsample)
        self.rand = bool(rand)
        self.metric_channels = int(metric_channels)
        self.share = bool(share)

    def _key(self):
        return (self.ratio, self.sx, self.sy, self.max_downsample, self.rand,
                self.metric_channels, self.share)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, TomeConfig) and self._key() == other._key()

    def __repr__(self):
        return (f"TomeConfig(ratio={self.ratio}, sx={self.sx}, sy={self.sy}, "
                f"max_downsample={self.max_downsample}, rand={self.rand}, "
                f"metric_channels={self.metric_channels}, share={self.share})")

    def r_for(self, h: int, w: int) -> int:
        """Number of tokens to merge at an h*w map (capped at the src count)."""
        n = h * w
        n_dst = (h // self.sy) * (w // self.sx)
        return min(int(n * self.ratio), n - n_dst)


def _dst_index_grid(h: int, w: int, sy: int, sx: int,
                    key: Optional[jax.Array]) -> jax.Array:
    """[hc*wc] flat token indices of the chosen destination in each cell.

    With a key, the in-cell offset is drawn per cell (paper's use_rand);
    without, the top-left corner is used.  Cells are the full sy x sx
    blocks only (h, w divisible by sy, sx at SD resolutions 64/32/16/8).
    """
    hc, wc = h // sy, w // sx
    cy = jnp.arange(hc) * sy  # [hc]
    cx = jnp.arange(wc) * sx  # [wc]
    if key is not None:
        ky, kx = jax.random.split(key)
        oy = jax.random.randint(ky, (hc, wc), 0, sy)
        ox = jax.random.randint(kx, (hc, wc), 0, sx)
    else:
        oy = jnp.zeros((hc, wc), jnp.int32)
        ox = jnp.zeros((hc, wc), jnp.int32)
    yy = cy[:, None] + oy  # [hc, wc]
    xx = cx[None, :] + ox  # [hc, wc]
    return (yy * w + xx).reshape(-1)  # [hc*wc]


def bipartite_soft_matching_2d(
    metric: jax.Array,
    h: int,
    w: int,
    cfg: TomeConfig,
    key: Optional[jax.Array] = None,
) -> Tuple[Callable[[jax.Array], jax.Array], Callable[[jax.Array], jax.Array]]:
    """Build (merge, unmerge) closures for one token map.

    metric: [B, N, C] similarity features (the transformer block's input,
      per the paper), N = h*w.  Returns
      merge:   [B, N, C'] -> [B, N - r, C']   (kept src ++ dst, dst updated
               with the mean of itself and its merged sources)
      unmerge: [B, N - r, C'] -> [B, N, C']   (sources read their dst's row)

    Matching is src -> best dst by cosine similarity; the r highest-scoring
    sources merge.  All shapes are static; only gather indices are traced.
    """
    B, N, _ = metric.shape
    assert N == h * w, f"metric tokens {N} != {h}x{w}"
    r = cfg.r_for(h, w)
    if r <= 0:
        return (lambda x: x), (lambda x: x)

    dst_idx = _dst_index_grid(h, w, cfg.sy, cfg.sx, key if cfg.rand else None)
    n_dst = dst_idx.shape[0]
    n_src = N - n_dst

    # src indices = complement of dst_idx.  With traced dst offsets the
    # complement is computed by masking a sort: positions marked dst sort
    # to the back, the first n_src entries are the sources (order-stable
    # within each class since jnp.sort on (flag*N + idx) is monotonic).
    is_dst = jnp.zeros((N,), jnp.int32).at[dst_idx].set(1)
    order = jnp.argsort(is_dst * N + jnp.arange(N))
    src_idx = order[:n_src]  # [n_src] traced token indices

    mc = cfg.metric_channels
    if mc and mc < metric.shape[-1]:
        metric = metric[..., :mc]
    mnorm = metric / (jnp.linalg.norm(metric.astype(jnp.float32), axis=-1,
                                      keepdims=True) + 1e-6)
    a = jnp.take(mnorm, src_idx, axis=1)  # [B, Ns, C]
    b = jnp.take(mnorm, dst_idx, axis=1)  # [B, Nd, C]
    scores = jnp.einsum("bsc,bdc->bsd", a, b,
                        preferred_element_type=jnp.float32)  # [B, Ns, Nd]
    best = jnp.argmax(scores, axis=-1)          # [B, Ns] dst slot per src
    val = jnp.max(scores, axis=-1)              # [B, Ns]

    # Top-r sources by similarity merge; the rest are kept.
    _, merge_order = jax.lax.top_k(val, n_src)  # [B, Ns] src slots, desc
    merged_slots = merge_order[:, :r]           # [B, r]
    kept_slots = merge_order[:, r:]             # [B, Ns - r]
    merged_dst = jnp.take_along_axis(best, merged_slots, axis=1)  # [B, r]

    n_kept = n_src - r
    kept_tok = jnp.take(src_idx, kept_slots)    # [B, n_kept] token ids
    merged_tok = jnp.take(src_idx, merged_slots)  # [B, r] token ids

    # Unmerge = ONE gather through a [B, N] index map into the merged rows
    # [kept | dst] (built with int32 scatters — 256 KB, vs scattering the
    # full [B, N, C] activations).
    brow = jnp.arange(B)[:, None]
    idx_map = jnp.zeros((B, N), jnp.int32)
    idx_map = idx_map.at[brow, kept_tok].set(jnp.arange(n_kept)[None, :])
    idx_map = idx_map.at[brow, dst_idx[None, :]].set(
        n_kept + jnp.arange(n_dst)[None, :])
    idx_map = idx_map.at[brow, merged_tok].set(n_kept + merged_dst)

    def _tile(a: jax.Array, b: int) -> jax.Array:
        # Adapt per-row index tensors to a batch that is a multiple of the
        # built batch (CFG tiling: the shared-prefix half builds at B, the
        # post-divergence sites run at 2B with the SAME per-sample matching
        # in both halves — identical semantics to building on the doubled
        # pre-divergence input, whose halves are bit-equal).
        if a.shape[0] == b:
            return a
        assert b % a.shape[0] == 0, (
            f"tome closure built for batch {a.shape[0]} applied to {b}")
        return jnp.tile(a, (b // a.shape[0],) + (1,) * (a.ndim - 1))

    def merge(x: jax.Array) -> jax.Array:
        bx = x.shape[0]
        kept = jnp.take_along_axis(x, _tile(kept_tok, bx)[..., None], axis=1)
        mx = jnp.take_along_axis(x, _tile(merged_tok, bx)[..., None], axis=1)
        xd = jnp.take(x, dst_idx, axis=1)                      # [B, Nd, C']
        # Segment-mean into dst rows via one-hot matmul (MXU, not scatter).
        onehot = jax.nn.one_hot(_tile(merged_dst, bx), n_dst,
                                dtype=x.dtype)                 # [B, r, Nd]
        sums = jnp.einsum("brd,brc->bdc", onehot, mx)
        cnts = onehot.sum(axis=1)[..., None]                   # [B, Nd, 1]
        xd = (xd + sums) / (1.0 + cnts).astype(x.dtype)
        return jnp.concatenate([kept, xd], axis=1)             # [B, N-r, C']

    def unmerge(x: jax.Array) -> jax.Array:
        return jnp.take_along_axis(x, _tile(idx_map, x.shape[0])[..., None],
                                   axis=1)

    merge.built_batch = B
    unmerge.built_batch = B
    return merge, unmerge


def merge_wavg(merge: Callable, x: jax.Array) -> jax.Array:
    """Convenience: apply a merge closure (kept for API parity with the
    paper's merge_wavg; the mean weighting lives inside merge itself)."""
    return merge(x)
