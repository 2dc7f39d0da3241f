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
   the scan without retracing.
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
    """

    __slots__ = ("ratio", "sx", "sy", "max_downsample", "rand")

    def __init__(self, ratio: float = 0.5, sx: int = 2, sy: int = 2,
                 max_downsample: int = 1, rand: bool = True):
        if not 0.0 < ratio < 1.0:
            raise ValueError(f"tome ratio must be in (0, 1), got {ratio}")
        self.ratio = float(ratio)
        self.sx = int(sx)
        self.sy = int(sy)
        self.max_downsample = int(max_downsample)
        self.rand = bool(rand)

    def __hash__(self):
        return hash((self.ratio, self.sx, self.sy, self.max_downsample, self.rand))

    def __eq__(self, other):
        return (
            isinstance(other, TomeConfig)
            and (self.ratio, self.sx, self.sy, self.max_downsample, self.rand)
            == (other.ratio, other.sx, other.sy, other.max_downsample, other.rand)
        )

    def __repr__(self):
        return (f"TomeConfig(ratio={self.ratio}, sx={self.sx}, sy={self.sy}, "
                f"max_downsample={self.max_downsample}, rand={self.rand})")

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

    def merge(x: jax.Array) -> jax.Array:
        xs = jnp.take(x, src_idx, axis=1)                      # [B, Ns, C']
        xd = jnp.take(x, dst_idx, axis=1)                      # [B, Nd, C']
        kept = jnp.take_along_axis(
            xs, kept_slots[..., None], axis=1)                 # [B, Ns-r, C']
        mx = jnp.take_along_axis(
            xs, merged_slots[..., None], axis=1)               # [B, r, C']
        # Segment-mean into dst rows via one-hot matmul (MXU, not scatter).
        onehot = jax.nn.one_hot(merged_dst, n_dst, dtype=x.dtype)  # [B, r, Nd]
        sums = jnp.einsum("brd,brc->bdc", onehot, mx)
        cnts = onehot.sum(axis=1)[..., None]                   # [B, Nd, 1]
        xd = (xd + sums) / (1.0 + cnts).astype(x.dtype)
        return jnp.concatenate([kept, xd], axis=1)             # [B, N-r, C']

    def unmerge(x: jax.Array) -> jax.Array:
        n_kept = n_src - r
        kept, xd = x[:, :n_kept], x[:, n_kept:]                # [B,*,C']
        mx = jnp.take_along_axis(
            xd, merged_dst[..., None], axis=1)                 # [B, r, C']
        # Rebuild the src table, then the full token order.
        xs = jnp.zeros((B, n_src, x.shape[-1]), x.dtype)
        xs = jnp.take_along_axis(
            jnp.concatenate([kept, mx], axis=1),
            jnp.argsort(jnp.concatenate([kept_slots, merged_slots], axis=1),
                        axis=1)[..., None],
            axis=1,
        ) + xs
        out = jnp.zeros((B, N, x.shape[-1]), x.dtype)
        out = out.at[:, src_idx].set(xs)
        out = out.at[:, dst_idx].set(xd)
        return out

    return merge, unmerge


def merge_wavg(merge: Callable, x: jax.Array) -> jax.Array:
    """Convenience: apply a merge closure (kept for API parity with the
    paper's merge_wavg; the mean weighting lives inside merge itself)."""
    return merge(x)
