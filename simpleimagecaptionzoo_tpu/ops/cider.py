"""On-device CIDEr-D reward for SCST.

The reference computes the SCST reward on the host every batch: decode ids ->
numpy -> strings -> ngram dicts -> CiderD (re-unpickling the idf table each
time) -> back to GPU (Utils.py:319-367, ciderD_scorer.py:79-82).  SURVEY.md
§3.2 calls this round-trip the dominant SCST cost.  Here the whole reward is
a jittable function of int32 token ids:

* n-grams are identified by a pair of independent 32-bit polynomial hashes
  (collision probability ~ (#ngrams)^2 / 2^64 — negligible, and the idf
  table build *verifies* zero collisions among its own keys).  h1 is
  finished with a murmur3 fmix32 avalanche (bijective — see HASH_VERSION)
  so the bucket index below stays uniform on real vocabularies.
* the idf table is two sorted uint32 arrays + an idf value array resident in
  HBM; lookup = ``searchsorted`` on the first hash + a short static probe
  comparing the second hash.  Ngrams absent from the table get
  ``df = 0  =>  idf = log_ref_len`` (ciderD_scorer.py:152 semantics).
* per-sentence tf and the clipped cosine similarity are computed with
  position-wise hash-equality matmuls — tiny (L<=20, Lr<=~60) and fully
  vectorized over the batch.

Exact semantics preserved from ciderD_scorer.py:127-206: count clipping
``min(tf_h, tf_r)*tf_r`` on idf-weighted vectors, per-n L2 normalization,
gaussian length penalty with sigma=6 on the *bigram-count* length
(``length += term_freq`` only for n==1... which indexes bigrams — see
evalcap/cider_scorer.py docstring), mean over n=1..4, mean over refs, x10.

Out-of-vocabulary ground-truth words are mapped to unique ids >= vocab_size
by :class:`RewardVocab` so they can never spuriously match a generated
``<unk>`` token — string-level matching semantics are preserved.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NGRAM_N = 4
_MULT1 = np.uint32(1000003)
_SEED1 = np.uint32(2166136261)
_MULT2 = np.uint32(16777619)
_SEED2 = np.uint32(0x9E3779B9)

# Version of the (h1, h2) key derivation.  Bumped when the hash changes so
# on-disk table caches (engine._cider_table npz) rebuild instead of silently
# mismatching freshly hashed queries.  v2: h1 gets a murmur3-style fmix32
# avalanche finalizer — the raw rolling hash is LINEAR in the last token id
# (h1 = prev*M + id + 1), so real vocabularies produce long runs of
# consecutive h1 values that pile into a few buckets of the top-bits index
# (measured probe 1025 on a corpus-shaped table vs ~10 after mixing).  The
# finalizer is bijective on uint32: key equality/uniqueness — and therefore
# CIDEr-D semantics and the build-time collision check — are unchanged.
HASH_VERSION = 2


def _fmix32_host(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    return h ^ (h >> 16)


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer, uint32 arrays (device twin of _fmix32_host)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> jnp.uint32(16))


# ---------------------------------------------------------------------------
# host-side: reward vocabulary (OOV-safe) and idf table build
# ---------------------------------------------------------------------------

class RewardVocab:
    """Maps words to ids for reward computation: in-vocab words use the
    caption vocabulary's ids; OOV ground-truth words get ids >= vocab_size
    derived from a stable content hash (md5) — NOT encounter order — so any
    two RewardVocab instances (preprocess-time idf export vs train-time
    reference encoding, separate processes) assign identical ids and the
    hashed idf tables always line up.  They still never collide with
    generated tokens (those are < vocab_size by construction)."""

    def __init__(self, vocab) -> None:
        self._word2ix = dict(vocab.word2ix)
        self._base = len(self._word2ix)
        # ids stay comfortably inside int32 so the device-side (id+1)
        # uint32 hashing never sees int32 wraparound
        self._span = (1 << 30) - self._base
        # OOV hash-id collision tracking: two distinct words sharing an id
        # alias their ngrams.  At COCO scale (tens of thousands of distinct
        # OOV ref words into a ~2^30 span) a birthday collision is likely,
        # so this is handled, not raised: colliding words are *merged* (the
        # idf table sums their dfs — see CiderDTable.__init__), which only
        # perturbs the reward's reference-vector norm for words too rare to
        # be in the vocab.  Candidate ngrams are unaffected (generated ids
        # are always < vocab_size).
        self._oov_id2word: dict = {}
        self.oov_collisions: set = set()

    def encode(self, words: Sequence[str]) -> List[int]:
        import hashlib
        out = []
        for w in words:
            ix = self._word2ix.get(w)
            if ix is None:
                h = int.from_bytes(
                    hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
                ix = self._base + (h % self._span)
                prev = self._oov_id2word.setdefault(ix, w)
                if prev != w:
                    self.oov_collisions.add((prev, w))
            out.append(ix)
        return out


def _hash_ngram_tuple(ng: tuple) -> np.uint64:
    """Combined 64-bit hash of one ngram of token ids (host; must match the
    device-side :func:`ngram_hashes` uint32 arithmetic exactly)."""
    m1, m2 = int(_MULT1), int(_MULT2)
    h1, h2 = int(_SEED1), int(_SEED2)
    for t in ng:
        h1 = (h1 * m1 + int(t) + 1) & 0xFFFFFFFF
        h2 = (h2 * m2 + int(t) + 1) & 0xFFFFFFFF
    return np.uint64((_fmix32_host(h1) << 32) | h2)


class CiderDTable:
    """Host-side idf table; ``device_arrays`` ships it to HBM once."""

    def __init__(self, h1: np.ndarray, h2: np.ndarray, df: np.ndarray,
                 log_ref_len: float) -> None:
        # merge duplicate (h1,h2) keys by summing df — duplicates arise when
        # two OOV words hash to the same RewardVocab id (see RewardVocab);
        # without merging, idf_lookup would return an arbitrary one of the
        # duplicate rows.  df is capped at ref_len so merged entries can't
        # produce negative idf.
        key = (np.asarray(h1, np.uint64) << np.uint64(32)) | np.asarray(
            h2, np.uint64)
        uniq, inv = np.unique(key, return_inverse=True)
        if len(uniq) < len(key):
            df = np.bincount(inv, weights=np.asarray(df, np.float64))
            df = np.minimum(df, np.exp(float(log_ref_len)))
            h1 = (uniq >> np.uint64(32)).astype(np.uint32)
            h2 = (uniq & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        order = np.lexsort((h2, h1))
        self.h1 = np.asarray(h1, np.uint32)[order]
        self.h2 = np.asarray(h2, np.uint32)[order]
        self.df = np.asarray(df, np.float32)[order]
        self.log_ref_len = float(log_ref_len)
        # Bucket index over the sorted keys: the h1 hash space is split into
        # ~2n power-of-two buckets by top bits, and ``bucket_start[b]`` is the
        # first sorted position whose h1 falls in bucket b.  Device lookup is
        # then one gather for the bucket start plus ``probe`` INDEPENDENT
        # probe gathers (probe = the fullest bucket's occupancy) — replacing
        # a 21-round *sequential* binary search whose gather chain dominated
        # the SCST step (docs/BENCHMARKS.md, on-device reward).
        n = len(self.h1)
        bits = max(1, min(23, int(np.ceil(np.log2(max(2 * n, 2))))))
        nb = 1 << bits
        self.bucket_bits = bits
        bounds = np.arange(nb + 1, dtype=np.int64) << (32 - bits)
        self.bucket_start = np.searchsorted(
            self.h1.astype(np.int64), bounds).astype(np.int32)
        if n:
            self.probe = int(np.diff(self.bucket_start).max())
        else:
            self.probe = 1

    @classmethod
    def from_ref_corpus(cls, images_token_ids: Iterable[List[List[int]]]
                        ) -> "CiderDTable":
        """images_token_ids: per image, a list of reference sentences, each a
        list of token ids (RewardVocab-encoded).  Document frequency = number
        of images whose refs contain the ngram (ciderD_scorer.py:113-118)."""
        df: Dict[np.uint64, float] = {}
        rep: Dict[np.uint64, tuple] = {}   # hash -> one representative ngram
        n_images = 0
        for refs in images_token_ids:
            n_images += 1
            seen = {}
            for ref in refs:
                arr = np.asarray(ref, dtype=np.int64)
                for n in range(1, NGRAM_N + 1):
                    for i in range(len(arr) - n + 1):
                        ng = tuple(int(t) for t in arr[i:i + n])
                        h = _hash_ngram_tuple(ng)
                        seen[h] = ng
            for h, ng in seen.items():
                prev = rep.setdefault(h, ng)
                if prev != ng:
                    raise ValueError(
                        f"64-bit ngram hash collision: {prev} vs {ng} — "
                        "idf table would merge distinct ngrams")
                df[h] = df.get(h, 0.0) + 1.0
        keys = np.array(sorted(df.keys()), dtype=np.uint64)
        h1 = (keys >> np.uint64(32)).astype(np.uint32)
        h2 = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        vals = np.array([df[k] for k in keys], dtype=np.float32)
        return cls(h1, h2, vals, float(np.log(max(float(n_images), 1.0))))

    @classmethod
    def from_reference_pickle(cls, path: str, reward_vocab: RewardVocab
                              ) -> "CiderDTable":
        """Convert a reference-format idf pickle
        ({'ref_len': float, 'document_frequency': {word-tuple: df}},
        PreProcess/CIDEr_idf_preproccess.py:41-82)."""
        import pickle
        with open(path, "rb") as f:
            pkl = pickle.load(f, encoding="latin1")
        dfd = pkl["document_frequency"]
        h1s, h2s, vals = [], [], []
        rep: Dict[np.uint64, tuple] = {}
        for ngram, dfv in dfd.items():
            ids = tuple(reward_vocab.encode(list(ngram)))
            h = _hash_ngram_tuple(ids)
            prev = rep.setdefault(h, ids)
            if prev != ids:
                raise ValueError(f"64-bit ngram hash collision: {prev} vs "
                                 f"{ids} for word ngram {ngram!r}")
            h1s.append(int(h >> np.uint64(32)))
            h2s.append(int(h & np.uint64(0xFFFFFFFF)))
            vals.append(dfv)
        return cls(np.array(h1s, np.uint32), np.array(h2s, np.uint32),
                   np.array(vals, np.float32),
                   float(np.log(float(pkl["ref_len"]))))

    def device_arrays(self) -> dict:
        return {
            "h1": jnp.asarray(self.h1),
            "h2": jnp.asarray(self.h2),
            "df": jnp.asarray(self.df),
            "bucket_start": jnp.asarray(self.bucket_start),
            "log_ref_len": jnp.float32(self.log_ref_len),
        }


# ---------------------------------------------------------------------------
# device-side kernels
# ---------------------------------------------------------------------------

def ngram_hashes(ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ids (..., L) int32 -> (h1, h2), each (..., NGRAM_N, L): hash of the
    n-gram *starting* at each position (positions where the ngram would run
    off the end produce garbage — callers mask by length)."""
    x = (ids + 1).astype(jnp.uint32)
    h1s, h2s = [], []
    h1 = jnp.full(x.shape, _SEED1, jnp.uint32)
    h2 = jnp.full(x.shape, _SEED2, jnp.uint32)
    for n in range(NGRAM_N):
        shifted = jnp.roll(x, -n, axis=-1) if n else x
        h1 = h1 * _MULT1 + shifted
        h2 = h2 * _MULT2 + shifted
        # emit the finalized copy; the rolling state stays raw (the mix is
        # applied once per completed ngram, matching _hash_ngram_tuple)
        h1s.append(_fmix32(h1))
        h2s.append(h2)
    return jnp.stack(h1s, axis=-2), jnp.stack(h2s, axis=-2)


def idf_lookup(table: dict, h1: jnp.ndarray, h2: jnp.ndarray,
               probe: int) -> jnp.ndarray:
    """idf = log_ref_len - log(max(1, df)) for each queried ngram hash.

    With a ``bucket_start`` index (CiderDTable layout) the lookup is one
    gather to find the query's h1-top-bits bucket plus ``probe`` probe
    gathers that are mutually independent (XLA overlaps them) — TPU gathers
    are latency-bound, so replacing the 21-round sequential binary-search
    chain with a 1+probe-deep graph is ~5x faster at SCST production
    shapes.  Hash equality on (h1, h2) implies same bucket, so no
    bucket-end check is needed.  Dicts without ``bucket_start`` (externally
    built) fall back to the binary-search path — same results."""
    t1, t2, df = table["h1"], table["h2"], table["df"]
    m = t1.shape[0]
    if "bucket_start" in table:
        bstart = table["bucket_start"]
        bits = (bstart.shape[0] - 1).bit_length() - 1
        bucket = jax.lax.shift_right_logical(
            h1.astype(jnp.uint32), jnp.uint32(32 - bits)).astype(jnp.int32)
        pos = jnp.take(bstart, bucket)
    else:
        pos = jnp.searchsorted(t1, h1, side="left")
    found_df = jnp.zeros(h1.shape, jnp.float32)
    for j in range(probe):
        idx = jnp.minimum(pos + j, m - 1)
        hit = (jnp.take(t1, idx) == h1) & (jnp.take(t2, idx) == h2)
        found_df = jnp.where(hit, jnp.take(df, idx), found_df)
    return table["log_ref_len"] - jnp.log(jnp.maximum(1.0, found_df))


def _sentence_stats(ids: jnp.ndarray, length: jnp.ndarray, table: dict,
                    probe: int):
    """ids (B, L), length (B,) -> per-position ngram stats:
    valid (B,4,L), tf (B,4,L), w=tf*idf (B,4,L), idf (B,4,L), norms (B,4),
    h1/h2."""
    b, l = ids.shape
    h1, h2 = ngram_hashes(ids)
    pos = jnp.arange(l)
    ncount = jnp.arange(1, NGRAM_N + 1)
    valid = (pos[None, None, :] + ncount[None, :, None]) <= length[:, None, None]
    # tf via pairwise hash equality within the sentence
    same = ((h1[..., :, None] == h1[..., None, :])
            & (h2[..., :, None] == h2[..., None, :]))          # (B,4,L,L)
    same = same & valid[..., None, :] & valid[..., :, None]
    tf = jnp.sum(same, axis=-1).astype(jnp.float32)            # (B,4,L)
    idf = idf_lookup(table, h1, h2, probe)
    w = tf * idf                                               # tf-idf weight
    # norm^2 = sum over unique ngrams of w^2 = sum over positions w^2/tf
    contrib = jnp.where(valid & (tf > 0), (w * w) / jnp.maximum(tf, 1.0), 0.0)
    norms = jnp.sqrt(jnp.sum(contrib, axis=-1))                # (B,4)
    return valid, tf, w, idf, norms, h1, h2


def ref_norms_device(table: dict, probe: int, ref_ids: jnp.ndarray,
                     ref_lens: jnp.ndarray) -> jnp.ndarray:
    """Per-reference tf-idf vector norms (B, R, 4), jittable.

    The reference sentences' idf lookups feed ONLY these norms inside
    :func:`cider_d_device` (the hyp<->ref match uses raw hashes, and matched
    ngrams take the *hyp-side* idf).  References are fixed per image, so the
    engine precomputes this once per dataset and the SCST step never touches
    the idf table for refs — removing ~85% of its table gathers
    (docs/BENCHMARKS.md, on-device reward)."""
    b, r, lr = ref_ids.shape
    _, _, _, _, norms, _, _ = _sentence_stats(
        ref_ids.reshape(b * r, lr), ref_lens.reshape(b * r), table, probe)
    return norms.reshape(b, r, NGRAM_N)


def ref_stats_device(table: dict, probe: int, ref_ids: jnp.ndarray,
                     ref_lens: jnp.ndarray,
                     ref_norms: jnp.ndarray = None):
    """(rv, rnorm, rh1, rh2) for (B, R, Lr) reference ids, computed ONCE and
    shared by both :func:`cider_d_device` calls of the SCST reward.  With
    precomputed ``ref_norms`` (B, R, 4) the idf table is never touched —
    hashes and validity masks are pure arithmetic."""
    b, r, lr = ref_ids.shape
    if ref_norms is None:
        flat_ids = ref_ids.reshape(b * r, lr)
        flat_len = ref_lens.reshape(b * r)
        rv, _, _, _, rnorm, rh1, rh2 = _sentence_stats(
            flat_ids, flat_len, table, probe)
        rnorm = rnorm.reshape(b, r, NGRAM_N)
    else:
        rh1, rh2 = ngram_hashes(ref_ids.reshape(b * r, lr))
        pos = jnp.arange(lr)
        ncount = jnp.arange(1, NGRAM_N + 1)
        rv = ((pos[None, None, :] + ncount[None, :, None])
              <= ref_lens.reshape(b * r)[:, None, None])
        rnorm = ref_norms
    return (rv.reshape(b, r, NGRAM_N, lr), rnorm,
            rh1.reshape(b, r, NGRAM_N, lr), rh2.reshape(b, r, NGRAM_N, lr))


def cider_d_device(table: dict, probe: int,
                   hyp_ids: jnp.ndarray, hyp_len: jnp.ndarray,
                   ref_ids: jnp.ndarray, ref_lens: jnp.ndarray,
                   sigma: float = 6.0, ref_stats=None) -> jnp.ndarray:
    """CIDEr-D scores (B,) on device.

    hyp_ids (B, L) int32, hyp_len (B,); ref_ids (B, R, Lr) int32 (padded,
    unused refs length 0), ref_lens (B, R).  ``ref_stats`` — optional
    precomputed :func:`ref_stats_device` output (the SCST reward shares one
    across its two calls instead of recomputing the refs' idf lookups).
    """
    b, l = hyp_ids.shape
    _, r, lr = ref_ids.shape
    hv, htf, hw, hidf, hnorm, hh1, hh2 = _sentence_stats(
        hyp_ids, hyp_len, table, probe)
    if ref_stats is None:
        ref_stats = ref_stats_device(table, probe, ref_ids, ref_lens)
    rv, rnorm, rh1, rh2 = ref_stats

    # match hyp positions against ref positions: (B, R, 4, L, Lr)
    eq = ((hh1[:, None, :, :, None] == rh1[:, :, :, None, :])
          & (hh2[:, None, :, :, None] == rh2[:, :, :, None, :]))
    eq = eq & hv[:, None, :, :, None] & rv[:, :, :, None, :]
    # tf of the hyp ngram *in the ref* (0 if absent)
    ref_tf_of_hyp = jnp.sum(eq, axis=-1).astype(jnp.float32)   # (B,R,4,L)
    # idf is a property of the ngram: ref-side weight = ref_tf * idf
    ref_w_of_hyp = ref_tf_of_hyp * hidf[:, None]               # (B,R,4,L)
    # clipped product summed over unique hyp ngrams:
    # sum over positions [min(hw, rw) * rw] / htf
    clipped = jnp.minimum(hw[:, None], ref_w_of_hyp) * ref_w_of_hyp
    hv_f = hv.astype(jnp.float32)
    num = jnp.sum(jnp.where(htf[:, None] > 0,
                            clipped / jnp.maximum(htf[:, None], 1.0), 0.0)
                  * hv_f[:, None], axis=-1)                    # (B,R,4)
    denom = hnorm[:, None] * rnorm                             # (B,R,4)
    val = jnp.where(denom > 0, num / jnp.maximum(denom, 1e-12), 0.0)
    # gaussian length penalty on bigram-count lengths (see module docstring)
    len_h = jnp.maximum(hyp_len - 1, 0).astype(jnp.float32)
    len_r = jnp.maximum(ref_lens - 1, 0).astype(jnp.float32)
    delta = len_h[:, None] - len_r                             # (B,R)
    val = val * jnp.exp(-(delta ** 2) / (2 * sigma ** 2))[:, :, None]
    # refs with length 0 are padding -> contribute 0 and don't count
    ref_real = (ref_lens > 0).astype(jnp.float32)              # (B,R)
    val = val * ref_real[:, :, None]
    n_refs = jnp.maximum(jnp.sum(ref_real, axis=-1), 1.0)      # (B,)
    score = jnp.mean(jnp.sum(val, axis=1), axis=-1) / n_refs * 10.0
    return score


# ---------------------------------------------------------------------------
# SCST reward assembly
# ---------------------------------------------------------------------------

def seq_length_sampled(seq: jnp.ndarray) -> jnp.ndarray:
    """Length convention of the *sampled* rollout: ids are zeroed from the
    <end> step on; the reference keeps everything up to the last nonzero id
    (Utils.py:336-341).  (B, L) -> (B,)."""
    nonzero = seq > 0
    return jnp.where(jnp.any(nonzero, axis=-1),
                     seq.shape[-1] - jnp.argmax(jnp.flip(nonzero, -1), -1),
                     1)  # all-zero row -> the reference keeps 1 token (<pad>)


def seq_length_greedy(seq: jnp.ndarray) -> jnp.ndarray:
    """Greedy decode keeps words up to (excluding) the first <end>
    (Utils.py:349-356).  (B, L) -> (B,)."""
    from simpleimagecaptionzoo_tpu import END_ID
    is_end = seq == END_ID
    return jnp.where(jnp.any(is_end, axis=-1),
                     jnp.argmax(is_end, axis=-1),
                     seq.shape[-1])


def self_critical_reward(table: dict, probe: int,
                         sample_seq: jnp.ndarray, greedy_seq: jnp.ndarray,
                         ref_ids: jnp.ndarray, ref_lens: jnp.ndarray,
                         cider_weight: float = 1.0,
                         ref_norms: jnp.ndarray = None) -> jnp.ndarray:
    """reward (B,) = CIDEr-D(sample) - CIDEr-D(greedy) (Utils.py:359-364);
    broadcast over steps by the caller.  ``ref_norms`` (B, R, 4), when the
    data layer ships :func:`ref_norms_device` values precomputed per image,
    removes every ref-side idf gather from the step."""
    rstats = ref_stats_device(table, probe, ref_ids, ref_lens, ref_norms)
    s_scores = cider_d_device(table, probe, sample_seq,
                              seq_length_sampled(sample_seq),
                              ref_ids, ref_lens, ref_stats=rstats)
    g_scores = cider_d_device(table, probe, greedy_seq,
                              seq_length_greedy(greedy_seq),
                              ref_ids, ref_lens, ref_stats=rstats)
    return cider_weight * (s_scores - g_scores)
