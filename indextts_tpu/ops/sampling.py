"""Pure-functional logits processors for the AR decode loop.

Reproduces the HF `generate()` processor semantics the reference relies on
(model.py:698-703 passes do_sample/top-k/top-p/temperature/repetition-penalty/
num-beams; typical sampling via indextts/utils/typical_sampling.py:4-30) as
jittable jnp transforms over [B, V] logits — no data-dependent shapes, sort-
based masking, f32 compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _colp(p) -> jnp.ndarray:
    """Normalize a sampling parameter to f32, scalar () or per-row [B, 1].

    Every transform below is written against [B, V] (or [B, k]) logits, so a
    1-D per-row parameter vector broadcasts once lifted to a column — this is
    what lets the continuous-batching serving path merge requests with
    DIFFERENT sampling knobs into one decode batch (engine.infer_batch
    per_request_kwargs)."""
    a = jnp.asarray(p, jnp.float32)
    return a[:, None] if a.ndim == 1 else a


def apply_temperature(logits: jnp.ndarray, temperature) -> jnp.ndarray:
    return logits / jnp.maximum(_colp(temperature), 1e-6)


def apply_repetition_penalty(logits: jnp.ndarray, seen_mask: jnp.ndarray, penalty) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor: for seen tokens, positive logits
    are divided by `penalty`, non-positive multiplied. `seen_mask`: [B, V] bool."""
    penalty = _colp(penalty)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


def apply_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Static-k masking (k=0 disables)."""
    if top_k is None or top_k <= 0:
        return logits
    k = min(int(top_k), logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p, min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """HF TopPLogitsWarper: remove the tail whose cumulative probability
    (ascending order) stays within 1 - top_p. top_p may be a traced scalar;
    top_p >= 1 reduces to the identity."""
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1), axis=-1)
    keep_sorted = cum > (1.0 - _colp(top_p))
    keep_sorted = keep_sorted.at[..., -min_tokens_to_keep:].set(True)
    # threshold = smallest kept logit
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_top_k_top_p(logits: jnp.ndarray, top_k: int, top_p, min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Fused exact top-k + top-p: one lax.top_k plus masked reductions over
    the vocab instead of top_k's partial sort PLUS top_p's FULL vocab sort
    (the [B, 8194] f32 sort costs ~0.25 ms/row-batch/step on the v5e decode
    loop).

    Exact equivalence with apply_top_p(apply_top_k(...)) INCLUDING ties at
    the k-th value: apply_top_k keeps every logit equal to the k-th
    (`logits < kth` masking), so the survivor set is {x : x >= kth} and may
    exceed k entries. The HF ascending cumulative test keeps a value level v
    iff the total survivor mass at-or-below v exceeds 1 - top_p (tied copies
    are all-or-nothing in the final `logits < thresh` mask), so the sorted
    scan reduces to per-level masses computed with reductions — no sort."""
    if not top_k or top_k <= 0:
        return apply_top_p(logits, top_p, min_tokens_to_keep)
    k = min(int(top_k), logits.shape[-1])
    lf = logits.astype(jnp.float32)
    vals = jax.lax.top_k(lf, k)[0]  # [B, k] descending (distinct levels <= k)
    kth = vals[..., -1:]
    support = lf >= kth
    mx = vals[..., :1]
    ex = jnp.where(support, jnp.exp(lf - mx), 0.0)
    z = jnp.sum(ex, axis=-1, keepdims=True)
    # c[b, j] = survivor mass at-or-below level vals[b, j]
    at_or_below = lf[..., None, :] <= vals[..., :, None]  # [B, k, V]
    c = jnp.sum(jnp.where(at_or_below, ex[..., None, :], 0.0), axis=-1) / z
    keep = c > (1.0 - _colp(top_p))
    # min_tokens_to_keep: the composed path force-keeps the top entries of
    # the ascending sort, i.e. the largest values
    keep = keep.at[..., :min_tokens_to_keep].set(True)
    thresh = jnp.min(jnp.where(keep, vals, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_typical(logits: jnp.ndarray, mass: float = 0.9, min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Typical sampling (behavioral reference: typical_sampling.py:4-30):
    keep tokens whose -log p is closest to the distribution entropy until
    `mass` cumulative probability is covered."""
    lf = logits.astype(jnp.float32)
    normalized = jax.nn.log_softmax(lf, axis=-1)
    p = jnp.exp(normalized)
    ent = -jnp.sum(jnp.where(p > 0, normalized * p, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-normalized - ent)
    order = jnp.argsort(shifted, axis=-1)  # ascending
    sorted_logits = jnp.take_along_axis(lf, order, axis=-1)
    sorted_shifted = jnp.take_along_axis(shifted, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    last_ind = jnp.sum(cum < _colp(mass), axis=-1, keepdims=True)  # [B, 1]
    cutoff = jnp.take_along_axis(sorted_shifted, last_ind, axis=-1)  # [B, 1]
    remove = shifted > cutoff
    if min_tokens_to_keep > 1:
        keep_rank = jnp.argsort(order, axis=-1)  # rank of each vocab id in sort order
        remove = jnp.where(keep_rank < min_tokens_to_keep, False, remove)
    return jnp.where(remove, NEG_INF, logits).astype(logits.dtype)


def sample_token(rng: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Categorical sample over masked logits [B, V] -> [B]."""
    return jax.random.categorical(rng, logits.astype(jnp.float32), axis=-1)


def greedy_token(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1)


def process_logits(
    logits: jnp.ndarray,
    seen_mask: jnp.ndarray = None,
    repetition_penalty: float = 1.0,
    typical_sampling: bool = False,
    typical_mass: float = 0.9,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    do_sample: bool = True,
    num_beams: int = 1,
) -> jnp.ndarray:
    """Full processor stack in HF order: processors (repetition penalty,
    typical) then warpers (temperature, top-k, top-p) when sampling."""
    lf = logits.astype(jnp.float32)
    # temperature/top_p/repetition_penalty may be traced scalars — the
    # transforms below are identities at their neutral values, so they are
    # applied unconditionally; only static structure (do_sample, top_k,
    # typical_sampling) gates tracing.
    if seen_mask is not None:
        lf = apply_repetition_penalty(lf, seen_mask, repetition_penalty)
    if typical_sampling:
        mtk = 2 if num_beams > 1 else 1
        lf = apply_typical(lf, typical_mass, min_tokens_to_keep=mtk)
    if do_sample:
        lf = apply_temperature(lf, temperature)
        # HF builds its top-k/top-p warpers with min_tokens_to_keep=2 when
        # num_beams > 1 (beam_sample needs >= 2 live candidates per beam):
        # with repetition-penalty-peaked distributions top-p would otherwise
        # leave a single survivor and the top-2*nb successor draw would fill
        # the remaining slots with NEG_INF junk, collapsing beams
        mtk = 2 if num_beams > 1 else 1
        if top_k:
            lf = apply_top_k_top_p(lf, max(int(top_k), mtk), top_p, min_tokens_to_keep=mtk)
        else:
            lf = apply_top_p(lf, top_p, min_tokens_to_keep=mtk)
    return lf
